package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-walk kernel behind [[LangId]] — the fused, single-pass form of
  * the stopword/CJK language-ID heuristic (`TextFunctions.languageId`'s
  * original Column formulation: `regexp_count` for the CJK class plus
  * 20 `contains` over a re-concatenated padded string, all inlined ~16×
  * into one CASE chain, which Janino took seconds to compile per query
  * — the whole t3/t5 cold-run cost in BENCH_r02).
  *
  * Byte-exact equivalences with the original expression:
  *   - `contains(' '||text||' ', ' w ')` ⇔ token `w` appears in `text`
  *     split on single 0x20 bytes (a space never occurs inside a
  *     multi-byte UTF-8 char, and `Contains` is a byte-level search, so
  *     token scanning byte-wise is exact — `LangIdKernelSpec`).
  *   - `regexp_count(text, '[一-鿿]') > 0` ⇔ some offset starts a valid
  *     3-byte UTF-8 sequence decoding into U+4E00–U+9FFF: E4–E9 leads
  *     only ever decode to that plane's rows, continuation bytes can't
  *     be E4–E9 (so no misaligned hit inside a longer valid sequence),
  *     and Java's decoder turns every malformed sequence into U+FFFD
  *     (never CJK), matching the scan skipping it.
  *   - null text → "und" (the CASE chain's `otherwise`: every branch
  *     condition is null-or-zero) — the expression is non-nullable.
  */
object LangIdKernel {

  private val ZH = UTF8String.fromString("zh")
  private val EN = UTF8String.fromString("en")
  private val DE = UTF8String.fromString("de")
  private val ES = UTF8String.fromString("es")
  private val FR = UTF8String.fromString("fr")
  private val UND = UTF8String.fromString("und")

  /** Marker words; bit i of the presence mask = word i seen. Groups of
    * five per language: en 0-4, de 5-9, es 10-14, fr 15-19 — must stay
    * in sync with `TextFunctions.markers`. */
  private val words: Array[Array[Byte]] = Array(
    "the", "and", "of", "to", "in",
    "der", "und", "die", "nicht", "ist",
    "el", "que", "los", "una", "por",
    "le", "et", "les", "des", "une").map(_.getBytes("UTF-8"))

  private def tokenBits(s: UTF8String, start: Int, len: Int): Int = {
    var m = 0
    var w = 0
    while (w < 20) {
      val wb = words(w)
      if (wb.length == len) {
        var j = 0
        while (j < len && s.getByte(start + j) == wb(j)) j += 1
        if (j == len) m |= 1 << w
      }
      w += 1
    }
    m
  }

  def langId(s: UTF8String): UTF8String = {
    if (s == null) return UND
    val n = s.numBytes
    // CJK presence wins immediately (the CASE chain's first branch —
    // scores are never computed for CJK text there either).
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (b >= 0xe4 && b <= 0xe9 && i + 2 < n) {
        val b1 = s.getByte(i + 1) & 0xff
        val b2 = s.getByte(i + 2) & 0xff
        if ((b1 & 0xc0) == 0x80 && (b2 & 0xc0) == 0x80) {
          val cp = ((b & 0x0f) << 12) | ((b1 & 0x3f) << 6) | (b2 & 0x3f)
          if (cp >= 0x4e00 && cp <= 0x9fff) return ZH
        }
      }
      i += 1
    }
    // presence mask over tokens split on single spaces
    var mask = 0
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == ' ') {
        val len = i - start
        if (len >= 2 && len <= 5) mask |= tokenBits(s, start, len)
        start = i + 1
      }
      i += 1
    }
    val en = Integer.bitCount(mask & 0x1f)
    val de = Integer.bitCount((mask >> 5) & 0x1f)
    val es = Integer.bitCount((mask >> 10) & 0x1f)
    val fr = Integer.bitCount((mask >> 15) & 0x1f)
    if (en >= de && en >= es && en >= fr && en > 0) EN
    else if (de >= es && de >= fr && de > 0) DE
    else if (es >= fr && es > 0) ES
    else if (fr > 0) FR
    else UND
  }
}

/** Predicted language of a text column — "zh", "en", "de", "es", "fr"
  * or "und" — as one compact kernel call: same output as the original
  * 20-contains CASE chain, but O(bytes) work and a two-line codegen
  * body instead of a multi-thousand-line Janino unit.
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    LangIdKernel.langId(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val kernel = "graft.functions.expressions.LangIdKernel$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        UTF8String ${ev.value} = $kernel.langId(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}
