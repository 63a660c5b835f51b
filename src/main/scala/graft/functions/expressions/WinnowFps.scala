package graft.functions.expressions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[WinnowFps]] — robust winnowing fingerprint
  * selection (Schleimer et al., SIGMOD'03): md5-hash every `k`-token
  * shingle ONCE, slide a `w`-wide window over the hash sequence with a
  * monotonic deque (O(shingles) total comparisons), and return the
  * distinct window minima in first-occurrence order.
  *
  * The per-row fused form of
  * `array_distinct(transform(seq, j -> array_min(slice(kg, j+1, w))))`
  * over `kg = transform(seq, i -> md5(array_join(slice(toks, i+1, k))))`
  * — which Catalyst inlines so every window re-evaluates the whole md5
  * array (O(n²) digests). Here each shingle is digested exactly once.
  * Hex digests compare lexicographically == numerically at fixed
  * width, so `String.compareTo` reproduces `array_min` exactly.
  */
object WinnowFpsKernel {

  private val HEX = "0123456789abcdef".toCharArray

  /** Null when fewer than `k + w - 1` tokens (no full window) — callers
    * explode, and `explode(null)` emits no rows, matching the upstream
    * size filter of the declarative form. */
  def fps(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    val nsh = n - k + 1
    if (nsh < w) return null
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    val hex = new Array[String](nsh)
    var i = 0
    while (i < nsh) {
      sb.setLength(0)
      // array_join semantics: a null element contributes neither itself
      // nor a separator — track whether anything has been appended rather
      // than keying the separator off position
      var t = 0
      var appended = false
      while (t < k) {
        val s = tokens.getUTF8String(i + t)
        if (s != null) {
          if (appended) sb.append(' ')
          sb.append(s.toString)
          appended = true
        }
        t += 1
      }
      val digest = md.digest(sb.toString.getBytes("UTF-8"))
      val chars = new Array[Char](32)
      var b = 0
      while (b < 16) {
        chars(2 * b) = HEX((digest(b) >> 4) & 0xf)
        chars(2 * b + 1) = HEX(digest(b) & 0xf)
        b += 1
      }
      hex(i) = new String(chars)
      i += 1
    }
    // sliding minimum via monotonic deque of indices; ties keep either
    // index — the min VALUE is identical, which is all that's emitted
    val seen = new java.util.LinkedHashSet[String](nsh * 2)
    val deque = new java.util.ArrayDeque[Integer](w + 1)
    var j = 0
    while (j < nsh) {
      while (!deque.isEmpty && hex(deque.peekLast) .compareTo(hex(j)) >= 0) deque.pollLast()
      deque.addLast(j)
      if (deque.peekFirst <= j - w) deque.pollFirst()
      if (j >= w - 1) seen.add(hex(deque.peekFirst))
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }
}

/** Per-row winnowing fingerprint set (`array<string>` of md5 hex) from a
  * token column — the document-fingerprinting primitive for verbatim-run
  * dedup. See [[WinnowFpsKernel]].
  */
case class WinnowFps(child: Expression, shingleK: Int, window: Int)
    extends UnaryExpression {

  require(shingleK >= 1 && window >= 1, "shingleK and window must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFpsKernel.fps(input.asInstanceOf[ArrayData], shingleK, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = "graft.functions.expressions.WinnowFpsKernel$.MODULE$"
      s"""
         |${ev.value} = $kernel.fps($c, $shingleK, $window);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}
