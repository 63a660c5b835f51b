package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Runtime kernel for [[TopShingleStats]] — counts word n-gram
  * frequencies of one document in a local hash map and returns
  * `(max frequency, total n-grams)`. The per-row fused form of
  * `explode(shingles) → groupBy(doc, shingle).count → groupBy(doc)
  * .agg(max, sum)`: identical numbers (exact string n-grams, raw — NOT
  * deduplicated), but computed map-side with no shuffle at all. Public
  * object so generated code can call it.
  */
object ShingleStatsKernel {

  /** Null when fewer than `n` tokens (no n-grams — the exploded plan
    * emits no rows for the doc, surfacing as a null after its join). */
  def stats(tokens: ArrayData, n: Int): InternalRow = {
    val nTokens = tokens.numElements()
    val nShingles = nTokens - n + 1
    if (nShingles <= 0) return null
    val counts = new java.util.HashMap[String, Int](nShingles * 2)
    val sb = new java.lang.StringBuilder(64)
    var max = 0
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      var w = 0
      while (w < n) {
        if (w > 0) sb.append(' ')
        val t = tokens.getUTF8String(i + w)
        if (t != null) sb.append(t.toString)
        w += 1
      }
      val key = sb.toString
      val c = counts.merge(key, 1, Integer.sum)
      if (c > max) max = c
      i += 1
    }
    new GenericInternalRow(Array[Any](max.toLong, nShingles.toLong))
  }
}

/** Per-row word n-gram frequency stats from a token column
  * (`array<string>`): `struct(maxc, total)` where `maxc` is the highest
  * single n-gram count and `total` the n-gram count — the inputs to a
  * Gopher-style top-n-gram repetition fraction. Fusing the frequency
  * count into a scalar kernel removes the explode and BOTH aggregate
  * shuffles of the relational formulation; per-doc hash counting is
  * O(tokens) and the map never leaves the task.
  */
case class TopShingleStats(child: Expression, shingleN: Int)
    extends UnaryExpression {

  require(shingleN >= 1, "shingleN must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("maxc", LongType, nullable = false),
    StructField("total", LongType, nullable = false)))
  override def prettyName: String = "top_shingle_stats"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleStatsKernel.stats(input.asInstanceOf[ArrayData], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = "graft.functions.expressions.ShingleStatsKernel$.MODULE$"
      s"""
         |${ev.value} = $kernel.stats($c, $shingleN);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TopShingleStats =
    copy(child = newChild)
}
