package graft.functions.expressions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[MinHashSig]] — builds word n-gram shingles from
  * the token array, hashes each shingle once (MD5, lowercase hex — the
  * exact bytes `md5()` would produce), and keeps k running minima over
  * the disjoint 4-hex slices. Public object so generated code can call
  * it. */
object MinHashKernel {

  private val hexChars = "0123456789abcdef".toCharArray

  /** Null when fewer than `shingleN` tokens (no shingles → no minima). */
  def sig(tokens: ArrayData, shingleN: Int, k: Int): ArrayData = {
    val n = tokens.numElements()
    val nShingles = n - shingleN + 1
    if (nShingles <= 0) return null
    val mins = new Array[String](k)
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      var w = 0
      while (w < shingleN) {
        if (w > 0) sb.append(' ')
        val t = tokens.getUTF8String(i + w)
        if (t != null) sb.append(t.toString)
        w += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes("UTF-8"))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = hexChars((digest(b) >> 4) & 0xf)
        hex(b * 2 + 1) = hexChars(digest(b) & 0xf)
        b += 1
      }
      val hexStr = new String(hex)
      var j = 0
      while (j < k) {
        val slice = hexStr.substring(j * 4, j * 4 + 4)
        if (mins(j) == null || slice.compareTo(mins(j)) < 0) mins(j) = slice
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => if (m == null) null else UTF8String.fromString(m)))
  }
}

/** Per-row MinHash signature from a token column (`array<string>`):
  * word `shingleN`-grams, k ≤ 8 hash functions as disjoint 4-hex slices
  * of one MD5 per shingle — the SAME family as
  * `Dedup.minhashSignatures` (explode+aggregate), byte-identical
  * output, but computed entirely map-side in one fused pass with no
  * higher-order functions in the plan (HOFs would break whole-stage
  * codegen).
  *
  * This is the streaming enabler: stateful operators can't follow an
  * aggregation in an append stream, so signature-per-row must be a
  * scalar expression. Also the right shape for map-only batch scoring
  * (signature written next to the document, no shuffle).
  */
case class MinHashSig(child: Expression, shingleN: Int, k: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 8, "k must be in [1,8] (32 hex chars / 4)")
  require(shingleN >= 1, "shingleN must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.sig(input.asInstanceOf[ArrayData], shingleN, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = "graft.functions.expressions.MinHashKernel$.MODULE$"
      s"""
         |${ev.value} = ($kernel.sig($c, $shingleN, $k));
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
