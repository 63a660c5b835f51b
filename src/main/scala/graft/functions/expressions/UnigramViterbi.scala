package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi kernel behind [[UnigramViterbi]]: OPTIMAL subword
  * segmentation against the same fixed vocabulary
  * [[WordPieceKernel.allPieces]] uses greedily — the SentencePiece
  * unigram-LM inference rule (Kudo 2018), where the segmentation is
  * the argmax over ALL tokenizations, not the longest-match walk.
  *
  * Objective, integer-exact and shared verbatim with the DuckDB
  * oracle: each piece of length L contributes `1024·L² − 1`, and the
  * word's tokenization maximizes the sum. Because ΣL is pinned to the
  * word length, maximizing Σ(1024·L² − 1) = 1024·ΣL² − tokens is the
  * LEXICOGRAPHIC objective (maximize ΣL², then fewest tokens) for any
  * word under 1024 letters — one additive score encodes the real
  * unigram-LM preference (longer, rarer pieces) plus a deterministic
  * tie-break both engines can reproduce. The per-word DP additionally
  * tracks the token count and prefers fewer tokens on exactly-equal
  * scores, so even a ≥1024-letter pathological word stays aligned
  * with the oracle's MIN(tokens)-at-max-score election.
  *
  * Word definition is byte-identical to [[WordPieceKernel]] (maximal
  * ASCII-letter runs, ASCII lowercasing) and pieces probe the same
  * packed-int sorted arrays — one vocabulary definition across the
  * greedy and optimal tokenizers and both oracles. O(word·4) per word
  * with two small per-word DP arrays; stays a static call inside the
  * generated loop (the [[LangIdKernel]] pattern).
  *
  * Returns `[n_words, n_tokens, score]` — the word count, optimal
  * token count, and summed combined score of the whole text.
  */
object UnigramKernel {

  @inline private def isAlpha(b: Int): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  @inline private def lower(b: Int): Int = if (b <= 'Z') b + 32 else b

  def stats(s: UTF8String): ArrayData = {
    val n = s.numBytes
    var words = 0L
    var tokens = 0L
    var score = 0L
    var i = 0
    var dp = new Array[Long](0)
    var tk = new Array[Int](0)
    while (i < n) {
      if (isAlpha(s.getByte(i) & 0xff)) {
        var we = i
        while (we < n && isAlpha(s.getByte(we) & 0xff)) we += 1
        val wl = we - i
        if (dp.length < wl + 1) { // grow once per longer word, reused after
          dp = new Array[Long](wl + 1)
          tk = new Array[Int](wl + 1)
        }
        dp(0) = 0L; tk(0) = 0
        var p = 1
        while (p <= wl) {
          // the single-letter fallback keeps every position reachable
          var best = dp(p - 1) + (1024L - 1L)
          var bt = tk(p - 1) + 1
          val maxL = math.min(4, p)
          var L = 2
          while (L <= maxL) {
            var key = 0
            var j = p - L
            while (j < p) { key = (key << 8) | lower(s.getByte(i + j) & 0xff); j += 1 }
            if (WordPieceKernel.hasPiece(L, key)) {
              val c = dp(p - L) + (1024L * L * L - 1L)
              val t = tk(p - L) + 1
              if (c > best || (c == best && t < bt)) { best = c; bt = t }
            }
            L += 1
          }
          dp(p) = best; tk(p) = bt
          p += 1
        }
        words += 1L
        tokens += tk(wl)
        score += dp(wl)
        i = we
      } else i += 1
    }
    new GenericArrayData(Array(words, tokens, score))
  }
}

/** `[n_words, n_tokens, score]` of the Viterbi-optimal subword
  * segmentation of a text column (see [[UnigramKernel]]). */
case class UnigramViterbi(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "unigram_viterbi"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    UnigramKernel.stats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = "graft.functions.expressions.UnigramKernel$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.stats($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}
