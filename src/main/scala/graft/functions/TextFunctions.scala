package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis primitives for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting,
  * shingling. All are pure `Column` expressions built from codegen'd
  * built-ins — no UDFs — so they fuse into whole-stage codegen and run
  * map-side at any scale.
  */
object TextFunctions {

  /** Whitespace tokens (documents are single-space separated; empty
    * string yields one empty token, matching SQL split semantics —
    * callers on untrusted text should trim first). */
  def tokens(c: Column): Column = split(c, " ")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c)).cast(LongType)

  /** BPE-ish subword proxy: alphabetic runs, single digits, and single
    * punctuation marks each count as one token (a public
    * regex-pretokenizer approximation — the standard GPT-2-style
    * pretokenizer split classes). */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
  def bpeishTokenCount(c: Column): Column =
    regexp_count(c, lit(BpeishPattern)).cast(LongType)

  /** Distinct-token ratio — low values indicate repetitive/spammy text. */
  def uniqueTokenRatio(c: Column): Column =
    size(array_distinct(tokens(c))).cast(DoubleType) /
      greatest(size(tokens(c)), lit(1)).cast(DoubleType)

  /** Punctuation character count / ratio. */
  def punctCount(c: Column): Column =
    regexp_count(c, lit("[.,!?;:]")).cast(LongType)
  def punctRatio(c: Column): Column =
    punctCount(c).cast(DoubleType) / greatest(length(c), lit(1)).cast(DoubleType)

  /** Composite quality score in [0,1]: length credit (saturates at 100
    * tokens), lexical diversity, and punctuation sanity. Deterministic
    * per-row double arithmetic — no aggregation involved. */
  def qualityScore(c: Column): Column = {
    val lengthCredit = least(tokenCount(c).cast(DoubleType) / lit(100.0), lit(1.0))
    val diversity = uniqueTokenRatio(c)
    val punctSanity = lit(1.0) - least(punctRatio(c) * lit(10.0), lit(1.0))
    lengthCredit * lit(0.4) + diversity * lit(0.4) + punctSanity * lit(0.2)
  }

  /** Stopword-hit language scores (classic n-gram/stopword heuristic).
    * A language scores one point per marker word present. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " to ", " in "),
    "de" -> Seq(" der ", " und ", " die ", " nicht ", " ist "),
    "es" -> Seq(" el ", " que ", " los ", " una ", " por "),
    "fr" -> Seq(" le ", " et ", " les ", " des ", " une "))

  private def langScore(c: Column, words: Seq[String]): Column = {
    val padded = concat(lit(" "), c, lit(" "))
    words.map(w => when(padded.contains(w), lit(1)).otherwise(lit(0)))
      .reduce(_ + _)
  }

  /** Language ID: CJK presence wins immediately; otherwise argmax of
    * stopword scores with fixed tie order en > de > es > fr; 'und' when
    * nothing matches. Fused single-pass kernel — `languageIdReference`
    * is the original Column formulation it must stay byte-equal to
    * (pinned by LangIdKernelSpec; the inlined CASE chain cost seconds
    * of Janino compile per query in BENCH_r02's t3/t5). */
  def languageId(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.functions.expressions.LangId(GraftColumnBridge.expression(c)))
  }

  /** Greedy longest-match subword piece count against the fixed
    * [[graft.functions.expressions.WordPieceKernel]] vocabulary — the
    * WordPiece inference rule as one codegen'd byte-walk kernel. */
  def wordpieceTokens(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.functions.expressions.WordPieceTokens(
        GraftColumnBridge.expression(c)))
  }

  /** `[n_words, n_tokens, score]` of the Viterbi-OPTIMAL segmentation
    * against the same vocabulary [[wordpieceTokens]] walks greedily —
    * the SentencePiece unigram-LM inference rule as one codegen DP
    * kernel (see [[graft.functions.expressions.UnigramKernel]]). */
  def unigramViterbi(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.functions.expressions.UnigramViterbi(
        GraftColumnBridge.expression(c)))
  }

  /** LCS length over two token arrays — the ROUGE-L core as one
    * codegen'd rolling-row DP ([[graft.functions.expressions.LcsLength]]).
    * O(n·m) per pair: callers must bound both sides. */
  def lcsLength(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.functions.expressions.LcsLength(
        GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Total occurrences of every pattern in a text column (overlapping
    * included) via one shared Aho–Corasick automaton — O(bytes) per
    * row regardless of pattern count
    * ([[graft.functions.expressions.MultiPatternCount]]). */
  def multiPatternCount(text: Column, patterns: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.functions.expressions.MultiPatternCount(
        GraftColumnBridge.expression(text), patterns))
  }

  /** The pre-kernel formulation of [[languageId]] — equivalence-spec
    * oracle only; do not use in query paths (codegen size). */
  private[graft] def languageIdReference(c: Column): Column = {
    val zh = regexp_count(c, lit("[\\x{4e00}-\\x{9fff}]")) > lit(0)
    val s = markers.map { case (l, ws) => l -> langScore(c, ws) }.toMap
    when(zh, lit("zh"))
      .when(s("en") >= s("de") && s("en") >= s("es") && s("en") >= s("fr") && s("en") > 0, lit("en"))
      .when(s("de") >= s("es") && s("de") >= s("fr") && s("de") > 0, lit("de"))
      .when(s("es") >= s("fr") && s("es") > 0, lit("es"))
      .when(s("fr") > 0, lit("fr"))
      .otherwise(lit("und"))
  }

  /** 1-based fixed-stride window starts covering every token; empty
    * docs still get one start (the `greatest(size,1)` guard) — the ONE
    * definition of the window convention shared by chunking (t12) and
    * span dedup (d8), mirrored verbatim by their DuckDB
    * `range(1, greatest(len,1)+1, stride)` CTEs. */
  def windowStarts(toks: Column, stride: Int): Column =
    sequence(lit(1), greatest(size(toks), lit(1)), lit(stride))

  /** The token window at `start` (companion to [[windowStarts]]). */
  def windowSlice(toks: Column, start: Column, window: Int): Column =
    slice(toks, start, lit(window))

  /** Content fingerprint: md5 of whitespace-normalized lowercase text.
    * Identical in any engine with md5 — the cross-engine-stable stand-in
    * for a rolling hash. */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(c, "\\s+", " ")))

  /** Prefix fingerprint over the first n tokens — cheap blocking key for
    * near-dup candidate generation. */
  def prefixFingerprint(c: Column, n: Int): Column =
    md5(array_join(slice(tokens(c), 1, n), " "))

  /** Character k-shingles (distinct), 1-based positions — the unit set
    * for Jaccard/MinHash dedup. Built with sequence+transform HOFs, no
    * UDF. */
  def shingles(c: Column, k: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(c) - lit(k - 1), lit(1))),
        i => c.substr(i, lit(k))))
}
