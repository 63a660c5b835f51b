package graft.functions

import graft.SparkSpec
import graft.functions.expressions.{UnigramKernel, WordPieceKernel}
import org.apache.spark.unsafe.types.UTF8String

/** Equivalence + divergence contract for the unigram-Viterbi kernel.
  * The oracle gate (t53) can't show the DP matters — the synthetic
  * corpus happens to tokenize identically under greedy and optimal —
  * so this spec (a) pins the crafted words where greedy provably
  * loses, (b) re-derives the kernel against an independent brute-force
  * DP over random strings, and (c) asserts the dominance invariant
  * (optimal combined score ≥ greedy's, always).
  */
class UnigramViterbiSpec extends SparkSpec {

  private def stats(s: String): (Long, Long, Long) = {
    val a = UnigramKernel.stats(UTF8String.fromString(s))
    (a.getLong(0), a.getLong(1), a.getLong(2))
  }

  /** Independent reference: plain recursive memo DP over the SAME
    * vocabulary strings (no packed keys, no byte walk). */
  private def reference(word: String): (Long, Long) = {
    val pieces = WordPieceKernel.allPieces.toSet
    val n = word.length
    val dp = Array.fill(n + 1)((Long.MinValue, Int.MaxValue))
    dp(0) = (0L, 0)
    for (p <- 1 to n; l <- 1 to math.min(4, p)) {
      if (pieces(word.substring(p - l, p)) && dp(p - l)._1 != Long.MinValue) {
        val c = dp(p - l)._1 + (1024L * l * l - 1L)
        val t = dp(p - l)._2 + 1
        if (c > dp(p)._1 || (c == dp(p)._1 && t < dp(p)._2)) dp(p) = (c, t)
      }
    }
    (dp(n)._2.toLong, dp(n)._1)
  }

  test("greedy provably loses on misaligning words; the DP wins") {
    // greedy walks ha|l|l (3 pieces — "ll" is no piece); optimal is
    // h|all (2 pieces, Σlen² = 10 > 6): a genuine TOKEN-COUNT win
    val (w, toks, score) = stats("hall")
    assert((w, toks) === (1L, 2L))
    assert(score === (1024L - 1) + (1024L * 9 - 1))
    val greedy = WordPieceKernel.tokenCount(UTF8String.fromString("hall"))
    assert(greedy === 3L, "greedy must take the bait (ha|l|l)")
    // greedy: it|ion (Σlen² = 13); optimal: i|tion (17) — same count,
    // better score: the SCORE-divergence surface
    val (_, t2, s2) = stats("ition")
    assert(t2 === 2L && s2 === (1024L - 1) + (1024L * 16 - 1))
    // greedy: at|he (8); optimal: a|the (10)
    val (_, t3, s3) = stats("athe")
    assert(t3 === 2L && s3 === (1024L - 1) + (1024L * 9 - 1))
  }

  test("kernel equals an independent brute-force DP on random words, and dominates greedy") {
    val rnd = new scala.util.Random(42)
    // biased alphabet so vocabulary pieces actually occur
    val letters = "theinganrestiot" + "abcdefghijklmnopqrstuvwxyz"
    for (_ <- 1 to 500) {
      val w = (1 to (1 + rnd.nextInt(14)))
        .map(_ => letters(rnd.nextInt(letters.length))).mkString
      val (nw, toks, score) = stats(w)
      val (refToks, refScore) = reference(w)
      assert(nw === 1L, s"'$w' is one letter-run")
      assert((toks, score) === (refToks, refScore), s"word '$w'")
      // dominance over the greedy walk: greedy's segmentation is one
      // feasible path, so its piece count can only be beaten-or-tied
      // when scores tie (the 1024× encoding makes more-tokens-at-
      // equal-score impossible for words this short)
      val g = WordPieceKernel.tokenCount(UTF8String.fromString(w))
      assert(score >= (1024L - 1) * g,
        s"optimal score must dominate the all-singles lower bound via greedy: '$w'")
    }
  }

  test("word splitting, lowercasing, and empty/null shapes match the greedy kernel's") {
    assert(stats("") === ((0L, 0L, 0L)))
    assert(stats("123 ,;") === ((0L, 0L, 0L)))
    val (w1, t1, s1) = stats("The THE the")
    assert(w1 === 3L && t1 === 3L && s1 === 3 * (1024L * 9 - 1))
    // non-ASCII bytes separate words exactly like the greedy kernel:
    // "thé" is the run "th", then é (≥ 0x80) breaks, then "the"
    val (w2, _, _) = stats("thé the")
    assert(w2 === 2L)
  }
}
