package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-walk kernel behind [[WordPieceTokens]]: greedy longest-match
  * subword segmentation against a FIXED literal vocabulary (the
  * WordPiece/SentencePiece inference rule with a static English-subword
  * merge table), counting the pieces a text tokenizes into.
  *
  * Word definition (shared byte-for-byte with the DuckDB oracle): a
  * word is a maximal run of ASCII letters, lowercased ASCII-only
  * (A–Z → a–z; every non-ASCII byte is ≥ 0x80 and therefore a
  * separator — deliberately NOT unicode lowercasing, which can mint
  * ASCII letters from exotic codepoints, e.g. the Kelvin sign, and
  * would desynchronize the two engines' word streams). Within a word,
  * the cursor repeatedly takes the LONGEST vocabulary piece matching
  * at the current offset (4 → 3 → 2, single letters always match), so
  * the walk always advances and the piece count is well-defined.
  *
  * One pass, zero allocation: candidate pieces pack into an int key
  * (≤ 4 lowercased bytes) probed against sorted arrays with binary
  * search. A UDF doing this would cost serialization per row and break
  * whole-stage codegen; this stays a static call inside the generated
  * loop (the [[LangIdKernel]] pattern).
  */
object WordPieceKernel {

  /** Multi-character merge table. [[allPieces]] (this plus the 26
    * single letters) is interpolated into the oracle SQL literal, so
    * the two engines share ONE vocabulary definition. */
  val multiPieces: Seq[String] = Seq(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
    "ra", "ce",
    "the", "ing", "and", "ion", "tio", "ent", "ati", "for", "her",
    "ter", "hat", "tha", "ere", "ate", "his", "con", "res", "ver",
    "all",
    "tion", "atio", "that", "ther", "with", "ment", "ions", "this")

  /** Full vocabulary: every single letter (the fallback that makes the
    * greedy walk total) plus the merge table. */
  val allPieces: Seq[String] = ('a' to 'z').map(_.toString) ++ multiPieces

  private def packed(p: String): Int = {
    var k = 0
    p.foreach(c => k = (k << 8) | (c & 0xff))
    k
  }
  private val set2: Array[Int] =
    multiPieces.filter(_.length == 2).map(packed).sorted.toArray
  private val set3: Array[Int] =
    multiPieces.filter(_.length == 3).map(packed).sorted.toArray
  private val set4: Array[Int] =
    multiPieces.filter(_.length == 4).map(packed).sorted.toArray

  @inline private def isAlpha(b: Int): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  @inline private def lower(b: Int): Int = if (b <= 'Z') b + 32 else b

  /** Shared piece lookup for this kernel and [[UnigramKernel]]: is the
    * packed lowercase key a vocabulary piece of this length? */
  private[expressions] def hasPiece(len: Int, key: Int): Boolean = {
    val set = if (len == 4) set4 else if (len == 3) set3 else set2
    java.util.Arrays.binarySearch(set, key) >= 0
  }

  def tokenCount(s: UTF8String): Long = {
    val n = s.numBytes
    var toks = 0L
    var i = 0
    while (i < n) {
      if (isAlpha(s.getByte(i) & 0xff)) {
        var we = i
        while (we < n && isAlpha(s.getByte(we) & 0xff)) we += 1
        var p = i
        while (p < we) {
          var adv = 1
          val maxL = math.min(4, we - p)
          var L = maxL
          var key = 0
          var j = 0
          while (j < maxL) { key = (key << 8) | lower(s.getByte(p + j) & 0xff); j += 1 }
          while (L >= 2 && adv == 1) {
            val set = if (L == 4) set4 else if (L == 3) set3 else set2
            // drop trailing bytes as the candidate shrinks
            val k = key >>> (8 * (maxL - L))
            if (java.util.Arrays.binarySearch(set, k) >= 0) adv = L
            L -= 1
          }
          toks += 1
          p += adv
        }
        i = we
      } else i += 1
    }
    toks
  }
}

/** Greedy longest-match subword piece count of a text column (see
  * [[WordPieceKernel]]). */
case class WordPieceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "wordpiece_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    WordPieceKernel.tokenCount(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = "graft.functions.expressions.WordPieceKernel$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.tokenCount($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceTokens =
    copy(child = newChild)
}
