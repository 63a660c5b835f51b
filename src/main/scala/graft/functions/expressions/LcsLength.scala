package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Longest-common-subsequence LENGTH over two `array<string>` token
  * columns — the sequence-alignment primitive behind ROUGE-L
  * (Lin 2004) and diff-style similarity. One fused Wagner–Fischer DP
  * inside generated code: two rolling `long[cols+1]` rows allocated
  * once per evaluation, token equality via in-place `UTF8String`
  * comparison — no per-row Seq materialization, no UDF serialization,
  * and the expression stays inside the WholeStageCodegen span.
  *
  * O(n·m) per pair BY DESIGN: callers must bound both sides (the t56
  * gate truncates to the first 12 tokens and only ever evaluates the
  * LSH-candidate pairs — the DP never sees a quadratic pair set, and
  * each evaluation is a ≤144-cell table). Fail-fast on null elements,
  * the same contract as the dot-product kernels (a silent null-as-
  * empty would make a missing token list score as alignment 0 and
  * pass unnoticed).
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lcs_length"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    // null-element scan UP FRONT on both sides: inside the DP loops the
    // checks are skipped whenever the opposite array is empty (n==0
    // checks nothing; m==0 never reaches the right side) — exactly the
    // degenerate cases where a silent null must not score 0 (ADVICE r8)
    var k = 0
    while (k < n) { if (x.isNullAt(k)) FloatDotProduct.nullElement(k); k += 1 }
    k = 0
    while (k < m) { if (y.isNullAt(k)) FloatDotProduct.nullElement(k); k += 1 }
    var prev = new Array[Long](m + 1)
    var curr = new Array[Long](m + 1)
    var i = 1
    while (i <= n) {
      val xi = x.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        curr(j) =
          if (xi.equals(y.getUTF8String(j - 1))) prev(j - 1) + 1L
          else math.max(prev(j), curr(j - 1))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      java.util.Arrays.fill(curr, 0L)
      i += 1
    }
    prev(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val prev = ctx.freshName("prev")
      val curr = ctx.freshName("curr")
      val tmp = ctx.freshName("tmp")
      val xi = ctx.freshName("xi")
      val v = ctx.freshName("v")
      val k = ctx.freshName("k")
      val cls = FloatDotProduct.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |// up-front null scan: the DP loops skip the opposite side when
         |// one array is empty (see nullSafeEval)
         |for (int $k = 0; $k < $n; $k++)
         |  if ($a.isNullAt($k)) $cls.nullElement($k);
         |for (int $k = 0; $k < $m; $k++)
         |  if ($b.isNullAt($k)) $cls.nullElement($k);
         |long[] $prev = new long[$m + 1];
         |long[] $curr = new long[$m + 1];
         |for (int $i = 1; $i <= $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $xi = $a.getUTF8String($i - 1);
         |  for (int $j = 1; $j <= $m; $j++) {
         |    long $v;
         |    if ($xi.equals($b.getUTF8String($j - 1))) $v = $prev[$j - 1] + 1L;
         |    else $v = Math.max($prev[$j], $curr[$j - 1]);
         |    $curr[$j] = $v;
         |  }
         |  long[] $tmp = $prev; $prev = $curr; $curr = $tmp;
         |  java.util.Arrays.fill($curr, 0L);
         |}
         |${ev.value} = $prev[$m];
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}
