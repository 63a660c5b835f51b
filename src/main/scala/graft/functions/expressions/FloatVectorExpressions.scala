package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns.
  *
  * This is the hot-path primitive of similarity search: a Scala UDF would
  * deserialize both arrays to `Seq[Float]` per row and break whole-stage
  * codegen; the built-in HOF route (`aggregate(zip_with(...))`) allocates
  * an intermediate array per row. This expression reads both `ArrayData`
  * buffers in place — one fused loop inside generated code, no
  * allocation — and stays inside the WholeStageCodegen span.
  *
  * Accumulates in double (float32 products), summed in index order.
  *
  * Malformed embeddings fail fast instead of yielding quietly wrong
  * similarity scores: mismatched vector lengths and null elements both
  * raise (a corrupt embedding column is a data bug the pipeline must
  * surface, not average away).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) FloatDotProduct.lengthMismatch(n, y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) FloatDotProduct.nullElement(i)
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val cls = FloatDotProduct.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) $cls.lengthMismatch($n, $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) $cls.nullElement($i);
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

object FloatDotProduct {
  /** Codegen-callable error paths (branches are never-taken in healthy
    * data, so the in-loop checks cost ~nothing under branch prediction). */
  def lengthMismatch(nx: Int, ny: Int): Nothing =
    throw new IllegalArgumentException(
      s"float_dot: vector length mismatch ($nx vs $ny) — malformed embedding")
  def nullElement(i: Int): Nothing =
    throw new IllegalArgumentException(
      s"float_dot: null element at index $i — malformed embedding")
}

/** Native dot product over two `array<long>` columns — the exact-
  * arithmetic twin of [[FloatDotProduct]] for the oracle path, where
  * vectors are floor-scaled 1e-6 longs so every engine agrees
  * bit-for-bit. Replaces the interpreted `aggregate(zip_with(...))`
  * HOF (per-row intermediate array, breaks whole-stage codegen) with
  * one fused in-place loop. Same fail-fast contract on malformed
  * input.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) FloatDotProduct.lengthMismatch(n, y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) FloatDotProduct.nullElement(i)
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val cls = FloatDotProduct.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) $cls.lengthMismatch($n, $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) $cls.nullElement($i);
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Johnson–Lindenstrauss ±1 sign projection of a pre-scaled long
  * vector down to `k` dims: `out[t] = Σ_j sign(t, j) · v[j]` with
  * `sign(t, j) = +1 iff ((j·k + t + 1) · 2654435761) mod 2³² < 2³¹` —
  * the projection matrix is re-derived from the cell index, never
  * stored (and the multiplier's operand is ≤ d·k, nowhere near 2^63).
  * A native kernel because the HOF formulation (`transform` over an
  * `aggregate` lambda) is CodegenFallback — interpreted per row, it
  * measured 17s warm at the 100× probe where this loop is sub-second.
  * Fail-fast on null elements, same contract as the dot kernels.
  */
case class SignProject(child: Expression, k: Int) extends Expression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.LongType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else SignProject.project(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cls = SignProject.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        ArrayData ${ev.value} = null;
        if (!${ev.isNull}) { ${ev.value} = $cls.project(${c.value}, $k); }"""
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SignProject =
    copy(child = newChildren.head)
}

object SignProject {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def project(v: ArrayData, k: Int): ArrayData = {
    val d = v.numElements()
    val out = new Array[Long](k)
    var j = 0
    while (j < d) {
      if (v.isNullAt(j)) FloatDotProduct.nullElement(j)
      val x = v.getLong(j)
      var t = 0
      while (t < k) {
        val h = ((j.toLong * k + t + 1) * 2654435761L) % 4294967296L
        out(t) += (if (h < 2147483648L) x else -x)
        t += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Popcount of the bitwise AND of two equal-length `array<bigint>`
  * BITSETS — the set-intersection cardinality for token sets packed
  * into ⌈V/64⌉ words (V = vocabulary size). The verification primitive
  * of the exact prefix-filter similarity join (d26): intersecting two
  * packed sets is `words` AND+popcount steps instead of hashing two
  * string arrays per pair, and the loop runs fused inside
  * WholeStageCodegen. Same fail-fast malformed-input contract as the
  * dot kernels (length mismatch / null word raise — a silent 0 would
  * read as "disjoint sets" and pass unnoticed).
  */
case class BitsetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType
  override def prettyName: String = "bitset_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) FloatDotProduct.lengthMismatch(n, y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) FloatDotProduct.nullElement(i)
      s += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val cls = FloatDotProduct.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) $cls.lengthMismatch($n, $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) $cls.nullElement($i);
         |  $s += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two SORTED `array<bigint>` SETS via a
  * single merge pass — the verification primitive for similarity joins
  * whose element universe is data-scale (d16's 3-gram shingle hashes),
  * where d26's packed-bitset trick (⌈V/64⌉ words, V dimension-like)
  * cannot apply. O(|a|+|b|) comparisons, zero allocation, fused inside
  * WholeStageCodegen. Inputs must be duplicate-free and ascending
  * (both sides of the d16 verify come from one `array_sort` over the
  * per-doc distinct-shingle kernel output); null elements raise, as in
  * the dot kernels — a silent skip would undercount the intersection
  * and quietly drop matches.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var s = 0L
    var i = 0
    var j = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j)) FloatDotProduct.nullElement(i)
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { s += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val s = ctx.freshName("s")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val cls = FloatDotProduct.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |long $s = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) $cls.nullElement($i);
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $s++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
