package graft.functions.expressions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Runtime kernel for [[ShingleHashes]] — builds word n-gram shingles
  * from the token array, hashes each once (MD5, first 8 digest bytes
  * big-endian as a long), and returns the DISTINCT hashes in first-
  * occurrence order. The per-row fused form of
  * `array_distinct(transform(sequence(...), i -> array_join(slice(...))))`
  * + `md5()` — no HOFs in the plan, no gram strings ever materialized
  * as columns, an 8-byte join/intersect key instead of a ~60-char gram
  * or 32-char hex digest.
  *
  * Collision note: distinct grams collide on the 64-bit key with
  * probability ~m²/2⁶⁵ for m grams (≈1e-8 at ten million grams) —
  * the standard dedup-pipeline trade; a collision can only mark one
  * extra candidate pair / contaminated doc, never lose one.
  */
object ShingleHashKernel {

  /** Empty array (NOT null) when fewer than `n` tokens — callers explode
    * or intersect, and both treat empty as "no shingles", matching the
    * `otherwise(array())` of the HOF formulation. */
  def hashes(tokens: ArrayData, n: Int): ArrayData = {
    val nTokens = tokens.numElements()
    val nShingles = nTokens - n + 1
    if (nShingles <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long](nShingles * 2)
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
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
      md.reset()
      val digest = md.digest(sb.toString.getBytes("UTF-8"))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
      seen.add(java.lang.Long.valueOf(h))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Per-row distinct word n-gram hash set (`array<bigint>`) from a token
  * column — the blocking/intersect primitive for n-gram dedup and
  * decontamination at scale. See [[ShingleHashKernel]].
  */
case class ShingleHashes(child: Expression, shingleN: Int)
    extends UnaryExpression {

  require(shingleN >= 1, "shingleN must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashKernel.hashes(input.asInstanceOf[ArrayData], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = "graft.functions.expressions.ShingleHashKernel$.MODULE$"
      s"""
         |${ev.value} = $kernel.hashes($c, $shingleN);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
