package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import graft.functions.TextFunctions

/** Deduplication primitives for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Hash choice: md5 (cross-engine stable, oracle-checkable). For a pure
  * production Spark deployment, swapping md5 for xxhash64 in
  * `minhashSignature` is a one-line change and ~5× faster; the plan
  * shapes below are hash-agnostic.
  *
  * Scale design:
  *  - signatures/bitstrings are computed per-row with HOFs — map-side
  *    only, no shuffle, no UDFs;
  *  - LSH banding explodes only `bands` rows per doc (not shingles), so
  *    the candidate join shuffles |docs|×bands small rows;
  *  - exact Jaccard runs only on blocked candidate pairs, never all
  *    pairs.
  */
object Dedup {

  /** Distinct word n-grams from a token array. Guarded: fewer than n
    * tokens yields an EMPTY array — `sequence(1, size-n+1)` would count
    * DOWN for short inputs (Spark's sequence steps -1 when start >
    * stop) and feed `slice` an illegal 0 start. */
  def wordShingles(tokensCol: Column, n: Int): Column =
    when(size(tokensCol) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(tokensCol) - lit(n - 1)),
          i => array_join(slice(tokensCol, i, lit(n)), " "))))
      .otherwise(array())

  /** LSH band keys: signature sliced into `bands` rows-per-band groups,
    * each hashed with its band index. Docs sharing ANY key are
    * candidates. */
  def lshBandKeys(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => md5(concat(b.cast(StringType), lit("|"),
        array_join(slice(sigCol, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)), "|"))))

  /** MinHash signatures via explode + k min-aggregates.
    *
    * Why not [[minhashSignature]] here: Catalyst's CollapseProject
    * re-inlines any intermediate projection into the k lambda bodies, so
    * the shingle-construction expression is recomputed k times per row
    * and the resulting expression tree blows codegen out (measured 60×
    * slower at sf0.1). Exploding shingles and taking k `min` aggregates
    * is the scalable plan: partial aggregation combines map-side and the
    * shuffle carries only |docs| × k min values.
    *
    * Hash family: ONE md5 per shingle, sliced into k ≤ 8 disjoint 4-hex
    * substrings — k independent-enough 16-bit min-hash functions at 1/k
    * of the hashing cost (any engine reproduces substr(md5) exactly). */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int): DataFrame = {
    require(k <= 8, "k <= 8: signature slices one 32-hex md5 into 4-hex functions")
    // no array_distinct here: min() is duplicate-insensitive, so raw
    // shingles give the identical signature without the per-row dedup
    val tokens = TextFunctions.tokens(col(textCol))
    val rawShingles = transform(
      sequence(lit(1), greatest(size(tokens) - lit(shingleN - 1), lit(0))),
      i => array_join(slice(tokens, i, lit(shingleN)), " "))
    val sh = df.select(col(idCol), explode(rawShingles).as("_s"))
      .withColumn("_h", md5(col("_s")))
    val aggs = (0 until k).map { j =>
      min(substring(col("_h"), j * 4 + 1, 4)).as(s"_m$j")
    }
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until k).map(j => col(s"_m$j")): _*).as("_sig"))
  }

  /** Raw (non-distinct) word shingles — min() downstream is
    * duplicate-insensitive. Same short-input guard as [[wordShingles]]. */
  def rawWordShingles(textCol: Column, n: Int): Column = {
    val tokens = TextFunctions.tokens(textCol)
    when(size(tokens) >= n,
      transform(
        sequence(lit(1), size(tokens) - lit(n - 1)),
        i => array_join(slice(tokens, i, lit(n)), " ")))
      .otherwise(array())
  }

  /** Per-row signature via the [[graft.functions.expressions.MinHashSig]]
    * codegen expression — same hash family as [[minhashSignatures]],
    * zero shuffle, and shingling happens inside the kernel so the plan
    * has no higher-order function (HOFs break whole-stage codegen).
    * The streaming/map-only form. */
  def minhashSigExpr(textCol: Column, shingleN: Int = 3, k: Int = 8): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.MinHashSig(
      GraftColumnBridge.expression(TextFunctions.tokens(textCol)), shingleN, k))
  }

  /** Candidate near-dup pairs (idA < idB) via MinHash LSH. Signatures
    * come from the [[minhashSigExpr]] codegen kernel — map-side only,
    * byte-identical to the explode+aggregate plan (MinHashSigSpec) but
    * with no shuffle and no per-shingle row overhead. Docs too short to
    * shingle get a null signature → null band keys → dropped by the
    * equi-join, exactly as the aggregate plan drops them (explode of
    * zero shingles emits no rows). Then one explode of `bands` keys per
    * doc and one self-equi-join on the band key. */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 8, bands: Int = 4): DataFrame = {
    require(k % bands == 0,
      s"k ($k) must divide evenly into bands ($bands): integer division " +
        "would silently drop the trailing signature elements and weaken LSH recall")
    val rows = k / bands
    val sig = df.select(col(idCol), minhashSigExpr(col(textCol), shingleN, k).as("_sig"))
    minhashCandidatePairsFromSig(sig, idCol, bands, rows)
  }

  /** [[minhashCandidatePairs]] over an ALREADY-computed signature table
    * (a `_sig` array column) — callers probing several band
    * configurations of the SAME signatures (d21's parameter sweep)
    * compute the per-row MinHash kernel once and localCheckpoint it,
    * instead of paying it per config per join side (the self-join means
    * the sig subtree is otherwise evaluated twice per config — 8× for a
    * three-config sweep). */
  def minhashCandidatePairsFromSig(sig: DataFrame, idCol: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val keyed = sig.select(col(idCol),
      explode(lshBandKeys(col("_sig"), bands, rowsPerBand)).as("band_key"))
    val a = keyed.select(col(idCol).as("doc_a"), col("band_key"))
    val b = keyed.select(col(idCol).as("doc_b"), col("band_key"))
    a.join(b, Seq("band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Per-row distinct word n-gram 64-bit hashes via the
    * [[graft.functions.expressions.ShingleHashes]] codegen kernel —
    * the blocking/intersect primitive: no HOF shingle build, no gram
    * strings as columns, an 8-byte key instead of a ~60-char gram.
    * Empty array below `n` tokens, like [[wordShingles]]. */
  def shingleHashesExpr(textCol: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.ShingleHashes(
      GraftColumnBridge.expression(TextFunctions.tokens(textCol)), n))
  }

  /** Per-row 63-bit packed SimHash signature via the
    * [[graft.functions.expressions.SimHashSig]] codegen expression: one
    * MD5 per token, 63 sign counters in one kernel pass, result in a
    * single long. Same bit family as the explode + 63-sign-sum
    * aggregation (SimHashSigSpec proves byte-identity) but map-side
    * only — no explode, no shuffle, no per-bit substring in the plan.
    * Null for zero-token input (the aggregate plan drops those docs). */
  def simhashSigExpr(textCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.SimHashSig(
      GraftColumnBridge.expression(TextFunctions.tokens(textCol))))
  }

  /** 16-bit SimHash rendered as a bitstring ('1'/'0' ×16, bit 1 first).
    * Bit j votes +1 when hex digit j of md5(token) has its high bit set
    * (digit >= '8') — a hex-digit-wise simhash that never needs
    * hex→int conversion, so it is expressible in any SQL engine.
    * Entirely per-row (nested HOFs): zero shuffle. */
  def simhashBits(tokensCol: Column): Column =
    array_join(
      transform(
        sequence(lit(1), lit(16)),
        j => when(
          aggregate(tokensCol, lit(0),
            (acc, t) => acc + when(md5(t).substr(j, lit(1)) >= lit("8"), lit(1)).otherwise(lit(-1))
          ) > lit(0), lit("1")).otherwise(lit("0"))),
      "")

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** Exact dedup: first (min id) row per normalized-content fingerprint.
    * groupBy on the fingerprint = one hash-partial + final aggregate;
    * survivors join back by id (broadcast when survivors are small,
    * sort-merge otherwise — Catalyst decides). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextFunctions.fingerprint(col(textCol))
    val survivors = df.select(col(idCol), fp.as("_fp"))
      .groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    df.join(survivors, Seq(idCol), "left_semi")
  }
}
