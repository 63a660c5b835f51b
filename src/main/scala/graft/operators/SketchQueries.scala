package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Approximate (sketch) aggregates — the single-pass, bounded-memory
  * path for statistics that exact operators compute with a full shuffle
  * of distinct values:
  *
  *  - `approx_count_distinct` = HyperLogLog++: fixed ~kB state per
  *    group regardless of cardinality, mergeable across partitions, vs
  *    `countDistinct`'s shuffle of every distinct value;
  *  - `percentile_approx` = KLL/GK-style quantile sketch: bounded state
  *    vs exact percentile's per-group sorted buffer.
  *
  * At 100 TB these are not approximations of the plan — they ARE the
  * plan: exact distinct-counting a billion-cardinality column is a
  * terabyte shuffle; the sketch is 32 KB per group.
  *
  * Raw sketch values are engine-specific (DuckDB's HLL differs), so a
  * value-level hash oracle is impossible BY DESIGN. Instead the gate
  * carries a bounded-error contract through the hash (VERDICT r2 item
  * 5): the query outputs exact anchors (hash-checked against DuckDB's
  * own exact aggregation) plus booleans asserting each sketch landed
  * inside its published error bound, which the oracle pins to TRUE — a
  * sketch drifting out of bounds flips a boolean and fails the hash.
  * `SketchQueriesSpec` additionally pins tighter empirical accuracy and
  * determinism.
  */
object SketchQueries {

  /** sk1_sketches — per-source approximate profile of the documents
    * table, gated by exact anchors + in-bounds booleans:
    *
    *  - `hll_ok`: |approx − exact| ≤ 3·rsd·exact (rsd = 0.02; HLL++
    *    standard-error bound at 3σ, deterministic for fixed input);
    *  - `p50_ok`/`p95_ok`: a RANK-space check — the sketch's returned
    *    value is joined back against the data and its rank interval
    *    `[count(< v) + 1, count(≤ v)]` must intersect the target band
    *    `⌈q·n⌉ ± (⌈0.001·n⌉ + 1)`: five times the GK rank guarantee of
    *    1/accuracy = 0.0002 plus one rank of convention slack. Value-
    *    space bands (exact percentiles at q ∓ ε) are NOT scale-stable:
    *    below n ≈ 1/ε they interpolate strictly between two observed
    *    values and can never contain the sketch's observed-value
    *    output. Rank space is exact at every n.
    *
    * The join-back costs a second scan + a broadcast of one row per
    * group — the honest price of certifying a sketch without collecting
    * data to the driver. */
  def sk1(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("source"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.tokenCount(col("text")).as("toks"))
    val profile = base.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        approx_count_distinct(col("fp"), 0.02).as("au"),
        percentile_approx(col("toks"), lit(0.5), lit(5000)).as("ap50"),
        percentile_approx(col("toks"), lit(0.95), lit(5000)).as("ap95"))
    // rank target over NON-NULL metric rows: percentile_approx ignores
    // nulls, so the sketch's rank lives in the non-null ordering — a
    // null-text doc population would otherwise shift ceil(q·n) off the
    // sketch's actual universe and fail a correct sketch
    def rankOk(q: Double, ap: String): org.apache.spark.sql.Column = {
      val t = ceil(lit(q) * col("n_vals"))
      val allowed = ceil(lit(0.001) * col("n_vals")) + lit(1)
      (col(s"cle_$ap") >= t - allowed) && (col(s"clt_$ap") < t + allowed)
    }
    base.join(broadcast(profile), Seq("source"))
      .groupBy(col("source"))
      .agg(
        max(col("n_docs")).as("n_docs"),
        max(col("n_unique")).as("n_unique"),
        max(col("au")).as("au"),
        count(col("toks")).as("n_vals"),
        sum(when(col("toks") <= col("ap50"), 1L).otherwise(0L)).as("cle_ap50"),
        sum(when(col("toks") < col("ap50"), 1L).otherwise(0L)).as("clt_ap50"),
        sum(when(col("toks") <= col("ap95"), 1L).otherwise(0L)).as("cle_ap95"),
        sum(when(col("toks") < col("ap95"), 1L).otherwise(0L)).as("clt_ap95"))
      .select(col("source"), col("n_docs"), col("n_unique"),
        (abs(col("au") - col("n_unique")) <= lit(3 * 0.02) * col("n_unique"))
          .as("hll_ok"),
        rankOk(0.5, "ap50").as("p50_ok"),
        rankOk(0.95, "ap95").as("p95_ok"))
      .orderBy(col("source"))
  }

  private val sk1Sql =
    """SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS n_unique,
      |  TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p95_ok
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** sk2_hll_union — MERGEABLE Datasketches HLL: per-source sketches
    * over the doc fingerprint, then `hll_union_agg` merges the sketch
    * COLUMN into the global sketch — the two-level sketch→merge pattern
    * that replaces a terabyte distinct-shuffle with KB-sized state at
    * 100 TB (each executor sketches locally; only sketches move).
    * Gate: exact per-source/global distincts are hash anchors;
    * `est_ok` pins |estimate − exact| ≤ 3·rsd·exact with
    * rsd = 1.04/√2^12 (default lgConfigK = 12), which the oracle
    * asserts TRUE. Global exact ≠ sum of per-source exacts
    * (fingerprints span sources), so it takes its own aggregate — the
    * honest anchor cost, paid once.
    */
  def sk2(spark: SparkSession, dir: String): DataFrame = {
    val rsd = 1.04 / math.sqrt(1 << 12)
    val base = Tables.documents(spark, dir)
      .select(col("source"), TextFunctions.fingerprint(col("text")).as("fp"))
    val per = base.groupBy(col("source"))
      .agg(hll_sketch_agg(col("fp")).as("sk"),
        countDistinct(col("fp")).as("n_unique"))
    val perOut = per.select(col("source"), col("n_unique"),
      (abs(hll_sketch_estimate(col("sk")) - col("n_unique")) <=
        lit(3 * rsd) * col("n_unique")).as("est_ok"))
    val globalExact = base.agg(countDistinct(col("fp")).as("n_unique"))
    val merged = per.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val globalOut = globalExact.crossJoin(merged)
      .select(lit("~all").as("source"), col("n_unique"),
        (abs(col("est") - col("n_unique")) <= lit(3 * rsd) * col("n_unique"))
          .as("est_ok"))
    perOut.unionAll(globalOut).orderBy(col("source"))
  }

  private val sk2Sql =
    """WITH f AS (
      |  SELECT source, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
      |  FROM documents),
      |per AS (
      |  SELECT source, COUNT(DISTINCT fp) AS n_unique, TRUE AS est_ok
      |  FROM f GROUP BY source),
      |tot AS (
      |  SELECT '~all' AS source, COUNT(DISTINCT fp) AS n_unique, TRUE AS est_ok
      |  FROM f)
      |SELECT * FROM per UNION ALL SELECT * FROM tot ORDER BY source""".stripMargin

  /** sk3_heavy_hitters — frequency estimation via Count–Min Sketch, the
    * third member of the sketch family (HLL = distinct, KLL = quantiles,
    * CMS = frequencies): the token-frequency profile a tokenizer-training
    * or stopword-analysis pass needs without ever shuffling the token
    * stream. The sketch is built DISTRIBUTED (one pass, mergeable
    * per-partition tables, driver holds only the w×d counter array);
    * the exact top-20 token counts are the hash anchors, and `cms_ok`
    * pins the CMS contract — `exact ≤ estimate ≤ exact + ε·N` (the CMS
    * never under-counts; over-count is bounded by ε·total with
    * probability 1−δ) — which the oracle asserts TRUE.
    *
    * ε = 1e-4 ⇒ width 27 183 counters ≈ 0.2 MB/partition partial: the
    * 100 TB plan is this sketch per executor merged once, vs an exact
    * groupBy shuffling every token occurrence. The driver-side estimate
    * loop touches exactly the 20 anchor tokens (bounded, like the IVF
    * codebook collect); memoized per dir for re-entrant constructors. */
  private val cmsCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, Boolean)]]
  def sk3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eps = 1e-4
    val toks = Tables.documents(spark, dir)
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20)
    val checks = cmsCache.getOrElseUpdate(dir, {
      val cms = toks.stat.countMinSketch(
        "token", eps = eps, confidence = 0.999, seed = 42)
      val slack = math.ceil(eps * cms.totalCount()).toLong
      top.collect().toSeq.map { r =>
        val (t, n) = (r.getString(0), r.getLong(1))
        val est = cms.estimateCount(t)
        t -> (est >= n && est <= n + slack)
      }
    })
    // LEFT join + coalesce(false): the memo assumes data under `dir` is
    // immutable for the JVM lifetime. If it is ever regenerated
    // in-process, fresh top-20 tokens missing from the stale cache must
    // surface as a loud cms_ok=false — an inner join would silently
    // drop those rows, which reads as a confusing rows_match failure
    // instead of the sketch-contract failure it actually is
    top.join(broadcast(checks.toDF("token", "cms_ok")), Seq("token"), "left")
      .select(col("token"), col("n"),
        coalesce(col("cms_ok"), lit(false)).as("cms_ok"))
      .orderBy(col("n").desc, col("token"))
  }

  private val sk3Sql =
    """WITH t AS (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      |c AS (SELECT token, COUNT(*) AS n FROM t GROUP BY token)
      |SELECT token, n, TRUE AS cms_ok FROM c
      |ORDER BY n DESC, token LIMIT 20""".stripMargin

  /** sk4_hll_intersect — SKETCH SET ALGEBRA: estimate the overlap of
    * two distinct-sets (viewers ∩ purchasers) from their HLL sketches
    * by inclusion–exclusion, est(∩) = est(V) + est(P) − est(V∪P) — the
    * audience-overlap / snapshot-drift measurement that would otherwise
    * need a distinct-shuffle of both sides. Exact anchors ride one
    * extra pass (per-user event_type count: k≥1 ⇒ union member, k=2 ⇒
    * intersection member — union AND intersection from a single
    * aggregate); `est_ok` pins each estimate inside its 3σ band, the
    * intersection's band being the SUM of the three constituent bands
    * (errors add under inclusion–exclusion — the honest bound, which
    * is also why sketch intersections degrade for small overlaps).
    * Everything distributed: sketches merge, the driver sees only the
    * 1-row pivot of per-side estimates (the CMS-anchor pattern). */
  def sk4(spark: SparkSession, dir: String): DataFrame = {
    val rsd = 1.04 / math.sqrt(1 << 12)
    val e = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_type"), col("user_id"))
    val per = e.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("nx"))
    val perOut = per.select(col("event_type").as("set_name"),
      col("nx").as("n_exact"),
      (abs(hll_sketch_estimate(col("sk")) - col("nx")) <=
        lit(3 * rsd) * col("nx")).as("est_ok"))
    val wide = per
      .select(col("event_type"), hll_sketch_estimate(col("sk")).as("est"),
        col("nx"))
      .groupBy().pivot("event_type", Seq("view", "purchase"))
      .agg(first(col("est")).as("est"), first(col("nx")).as("nx"))
    val uEst = per.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("u_est"))
    val exacts = e.groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("k"))
      .agg(count(lit(1)).as("u_exact"),
        sum(when(col("k") === 2, 1L).otherwise(0L)).as("i_exact"))
    val row = exacts.crossJoin(uEst).crossJoin(wide)
    val unionOut = row.select(lit("~union").as("set_name"),
      col("u_exact").as("n_exact"),
      (abs(col("u_est") - col("u_exact")) <=
        lit(3 * rsd) * col("u_exact")).as("est_ok"))
    val interOut = row.select(lit("~intersect").as("set_name"),
      col("i_exact").as("n_exact"),
      (abs(col("view_est") + col("purchase_est") - col("u_est") - col("i_exact")) <=
        lit(3 * rsd) * (col("view_nx") + col("purchase_nx") + col("u_exact")))
        .as("est_ok"))
    perOut.unionAll(unionOut).unionAll(interOut).orderBy(col("set_name"))
  }

  private val sk4Sql =
    """WITH e AS (
      |  SELECT event_type, user_id FROM events
      |  WHERE event_type IN ('view', 'purchase')),
      |per AS (
      |  SELECT event_type AS set_name, COUNT(DISTINCT user_id) AS n_exact,
      |    TRUE AS est_ok
      |  FROM e GROUP BY event_type),
      |k AS (SELECT user_id, COUNT(DISTINCT event_type) AS k FROM e GROUP BY 1),
      |uni AS (SELECT '~union' AS set_name, COUNT(*) AS n_exact, TRUE AS est_ok FROM k),
      |its AS (SELECT '~intersect' AS set_name,
      |          CAST(SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
      |          TRUE AS est_ok
      |        FROM k)
      |SELECT * FROM per UNION ALL SELECT * FROM uni UNION ALL SELECT * FROM its
      |ORDER BY set_name""".stripMargin

  // ---------------------------------------------------------------------
  // sk5_cms_heavy — Count-Min sketch audit: build a depth-4 × width-256
  // CM sketch of the l_partkey stream and read back estimates for the
  // 10 heaviest keys against their exact counts. Unlike sk1–sk4 this
  // sketch is FULLY deterministic cross-engine (md5 bucket hashes, pure
  // integer cells), so the whole sketch read-back rides the hash oracle
  // — including the CM one-sided guarantee (est ≥ exact, pinned TRUE).
  // Scale shape: the build is ONE pass with the 4 hash rows exploded
  // map-side — the exchange carries (row, bucket) partials into at most
  // depth×width = 1024 cells, the textbook bounded-memory path for
  // heavy-key estimation over a 100 TB stream; the top-10 probe joins
  // the broadcast 1024-cell sketch.
  def sk5(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.lineitem(spark, dir).select(col("l_partkey").as("key"))
    // The row-hashes are xor-shift mixed multiplicative hashes with a
    // per-row additive offset (x35's lattice-breaking mix + d19's
    // pre-mod overflow guard) — pure codegen'd BIGINT arithmetic in the
    // hot loop. md5-hex parsing here cost 4.1s at sf0.1 for the same
    // sketch; the integer mix is 1.7s, and at 100 TB string hashing in
    // the per-row path is exactly the overhead a sketch exists to avoid.
    // Offsets are primes so the four hash functions differ everywhere.
    val slices = expr(
      """transform(array(0L, 7919L, 104729L, 1299709L), (p, j) ->
        |  struct(j AS j,
        |    ((((((key % 67108864) + p) * 2654435761L) % 4294967296L)
        |      ^ shiftright((((key % 67108864) + p) * 2654435761L)
        |                   % 4294967296L, 16))
        |     * 40503L) % 4294967296L % 256 AS bucket))""".stripMargin)
    val cells = keys
      .select(explode(slices).as("s"))
      .select(col("s.j").as("j"), col("s.bucket").as("bucket"))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("cell"))
    val top = keys.groupBy(col("key")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("key")).limit(10)
    top
      .select(col("key"), col("exact_n"), explode(slices).as("s"))
      .select(col("key"), col("exact_n"), col("s.j").as("j"),
        col("s.bucket").as("bucket"))
      .join(broadcast(cells), Seq("j", "bucket"))
      .groupBy(col("key"), col("exact_n"))
      .agg(min(col("cell")).as("est_n"))
      .select(col("key"), col("exact_n"), col("est_n"),
        (col("est_n") - col("exact_n")).as("overcount"),
        (col("est_n") >= col("exact_n")).as("cm_bound_ok"))
      .orderBy(col("key"))
  }

  private val sk5Sql =
    """WITH k AS (SELECT l_partkey AS key FROM lineitem),
      |offs AS (SELECT * FROM (VALUES (0, 0), (1, 7919), (2, 104729),
      |         (3, 1299709)) v(j, p)),
      |h AS (SELECT key, j,
      |    ((xor(((((key % 67108864) + p) * 2654435761) % 4294967296),
      |          ((((key % 67108864) + p) * 2654435761) % 4294967296) >> 16)
      |      * 40503) % 4294967296) % 256 AS bucket
      |  FROM k CROSS JOIN offs),
      |cells AS (SELECT j, bucket, COUNT(*) AS cell FROM h GROUP BY 1, 2),
      |top AS (SELECT key, COUNT(*) AS exact_n FROM k GROUP BY 1
      |        ORDER BY exact_n DESC, key LIMIT 10),
      |probe AS (SELECT key, exact_n, j,
      |    ((xor(((((key % 67108864) + p) * 2654435761) % 4294967296),
      |          ((((key % 67108864) + p) * 2654435761) % 4294967296) >> 16)
      |      * 40503) % 4294967296) % 256 AS bucket
      |  FROM top CROSS JOIN offs)
      |SELECT key, exact_n, CAST(MIN(cell) AS BIGINT) AS est_n,
      |  CAST(MIN(cell) - exact_n AS BIGINT) AS overcount,
      |  MIN(cell) >= exact_n AS cm_bound_ok
      |FROM probe JOIN cells USING (j, bucket)
      |GROUP BY key, exact_n ORDER BY key""".stripMargin

  // ---------------------------------------------------------------------
  // sk6_bloom_fpr — Bloom-filter false-positive-rate audit, the
  // empirical number that sizes the d7b/x8 filters before a 100 TB
  // run: k=3 md5 hashes into m=2^16 bits, members = one market
  // segment's customers, probes = everyone else, and a probe is a
  // false positive iff ALL its (distinct) bit positions are set.
  // Everything is exact integer/md5 arithmetic, so the measured FPR
  // hash-matches cross-engine. Scale shape: the bit set is
  // min(k·|members|, m) ≤ 2^16 rows and broadcasts; probes explode to
  // 3 positions map-side and aggregate right back to per-key — no
  // probe-side state beyond the aggregate.
  def sk6(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), col("c_mktsegment").as("seg"))
    def pos(i: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
      expr("conv(substring(md5(concat(cast(i AS string), ':', cast(key AS string))), 1, 8), 16, 10)")
        .cast("long") % 65536
    val members = cust.filter(col("seg") === "BUILDING").select(col("key"))
    val bits = members
      .select(col("key"), explode(expr("sequence(0, 2)")).as("i"))
      .select(pos(col("i"), col("key")).as("pos")).distinct()
      .withColumn("hit", lit(1L))
    val perProbe = cust.filter(col("seg") =!= "BUILDING").select(col("key"))
      .select(col("key"), explode(expr("sequence(0, 2)")).as("i"))
      .select(col("key"), pos(col("i"), col("key")).as("pos")).distinct()
      .join(broadcast(bits), Seq("pos"), "left")
      .groupBy(col("key"))
      .agg(count(lit(1)).as("np"),
        sum(coalesce(col("hit"), lit(0L))).as("nm"))
    val mstats = members.agg(count(lit(1)).as("n_members"))
    val bstats = bits.agg(count(lit(1)).as("n_bits_set"))
    perProbe
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("np") === col("nm"), 1L).otherwise(0L)).as("n_false_pos"))
      .crossJoin(broadcast(mstats)) // 1-row scalar ride-alongs
      .crossJoin(broadcast(bstats))
      .select(col("n_members"), col("n_bits_set"), col("n_probes"),
        col("n_false_pos"),
        expr("(n_false_pos * 1000000) div n_probes").as("fpr_ppm"))
  }

  private val sk6Sql =
    """WITH cust AS (SELECT c_custkey AS key, c_mktsegment AS seg FROM customer),
      |bits AS (
      |  SELECT DISTINCT
      |    CAST(CAST(concat('0x', substr(md5(i || ':' || key), 1, 8)) AS UBIGINT)
      |      % 65536 AS BIGINT) AS pos
      |  FROM cust CROSS JOIN range(0, 3) r(i) WHERE seg = 'BUILDING'),
      |pp AS (
      |  SELECT DISTINCT key,
      |    CAST(CAST(concat('0x', substr(md5(i || ':' || key), 1, 8)) AS UBIGINT)
      |      % 65536 AS BIGINT) AS pos
      |  FROM cust CROSS JOIN range(0, 3) r(i) WHERE seg <> 'BUILDING'),
      |per AS (
      |  SELECT key, COUNT(*) AS np,
      |    SUM(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END) AS nm
      |  FROM pp LEFT JOIN bits ON pp.pos = bits.pos GROUP BY key),
      |m AS (SELECT COUNT(*) AS n_members FROM cust WHERE seg = 'BUILDING'),
      |b AS (SELECT COUNT(*) AS n_bits_set FROM bits)
      |SELECT n_members, n_bits_set, COUNT(*) AS n_probes,
      |  CAST(SUM(CASE WHEN np = nm THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
      |  CAST((SUM(CASE WHEN np = nm THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
      |    AS BIGINT) AS fpr_ppm
      |FROM per CROSS JOIN m CROSS JOIN b
      |GROUP BY n_members, n_bits_set""".stripMargin

  // ---------------------------------------------------------------------
  // sk7_kmv — KMV (k-minimum-values) distinct-count sketch, the THIRD
  // distinct-counting sketch family next to HLL (sk2/sk4): hash every
  // key into a 2^32 universe, keep only the k=256 smallest DISTINCT
  // hash values, estimate |D| = (k−1)·2^32 / h_k. Unlike HLL the whole
  // sketch is engine-independent integer arithmetic, so the ESTIMATE
  // ITSELF hash-gates (sk2's HLL can only gate error-band booleans).
  // Scale shape: one lineitem pass through [[graft.functions
  // .KmvAggregator]] — partial state is ≤256 longs per map task (2 KB),
  // merge is set-union + re-truncate, NO distinct exchange anywhere
  // (the naive `distinct().orderBy().limit(k)` form shuffles the full
  // distinct hash set first — at 100 TB that exchange is the whole
  // cost). The exact countDistinct rides along as the audit anchor the
  // estimate is scored against; production consumes est_distinct only.
  // Hash: the overflow-guarded Knuth mix (pre-mod 2^26, the d19/t32
  // lesson) — injective below 2^26 keys, so at gate SF distinct
  // hashes = distinct orderkeys exactly; beyond 2^26 keys pre-mod
  // collisions fold into the estimator's own error budget
  // (~1/√k ≈ 6%, err band pinned ≤ 200000 ppm by the oracle).
  def sk7(spark: SparkSession, dir: String): DataFrame = {
    val h = Tables.lineitem(spark, dir)
      .select((((col("l_orderkey") % 67108864L) * 2654435761L) % 4294967296L)
        .as("hv"))
    val kmv = udaf(graft.functions.KmvAggregator.Kmv(256),
      org.apache.spark.sql.Encoders.scalaLong)
    val bottom = h.agg(kmv(col("hv")).as("ks"))
      .select(element_at(col("ks"), -1).as("kth_hash"),
        size(col("ks")).cast("long").as("kk"))
    val exact = Tables.lineitem(spark, dir)
      .agg(countDistinct(col("l_orderkey")).as("n_exact"))
    bottom.crossJoin(broadcast(exact)) // 1-row exact-anchor ride-along
      .select(col("n_exact"), col("kth_hash"),
        expr("(kk - 1) * 4294967296L div kth_hash").as("est_distinct"),
        expr("abs((kk - 1) * 4294967296L div kth_hash - n_exact) * 1000000" +
          " div n_exact").as("err_ppm"))
      .withColumn("in_bounds", col("err_ppm") <= 200000L)
  }

  private val sk7Sql =
    """WITH h AS (
      |  SELECT DISTINCT ((l_orderkey % 67108864) * 2654435761)
      |    % 4294967296 AS hv
      |  FROM lineitem),
      |k AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
      |t AS (SELECT CAST(MAX(hv) AS BIGINT) AS kth_hash,
      |    COUNT(*) AS kk FROM k),
      |n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact
      |  FROM lineitem)
      |SELECT n_exact, kth_hash,
      |  CAST((kk - 1) * 4294967296 // kth_hash AS BIGINT) AS est_distinct,
      |  CAST(abs((kk - 1) * 4294967296 // kth_hash - n_exact) * 1000000
      |    // n_exact AS BIGINT) AS err_ppm,
      |  abs((kk - 1) * 4294967296 // kth_hash - n_exact) * 1000000
      |    // n_exact <= 200000 AS in_bounds
      |FROM t CROSS JOIN n""".stripMargin

  // ---------------------------------------------------------------------
  // sk8_bitmap_distinct — EXACT distinct customers per order priority via
  // the word-chunked bitmap aggregator ([[graft.functions
  // .BitmapDistinctAggregator]]), the bitmap-index structure that
  // replaces countDistinct's Expand + distinct-exchange plan: partial
  // state is one bit per observed custkey (dense TPC keys → 64 ids per
  // 64-bit word), merge is word-wise OR, finish is a popcount sum — the
  // (group, value) pairs NEVER cross the wire. Exact at every
  // cardinality (unlike sk2's HLL / sk7's KMV), so the count itself
  // hash-gates against the oracle's COUNT(DISTINCT). Scale shape: one
  // orders pass, 5 groups, ≤⌈maxkey/64⌉ words per group partial;
  // at 10^9 dense custkeys that is 125 MB per group TOTAL across the
  // cluster vs the distinct exchange's per-pair shuffle rows.
  def sk8(spark: SparkSession, dir: String): DataFrame = {
    val bm = udaf(graft.functions.BitmapDistinctAggregator.BitmapDistinct,
      org.apache.spark.sql.Encoders.scalaLong)
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(bm(col("o_custkey")).as("distinct_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  private val sk8Sql =
    """SELECT o_orderpriority,
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS distinct_cust,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // sk9_kmv_setops — SET OPERATIONS on KMV sketches (Beyer et al. 2007,
  // the property that makes bottom-k the warehouse workhorse over HLL:
  // sketches COMPOSE): per-segment sketches of the 'view' and 'click'
  // user populations combine into union / intersection / Jaccard
  // estimates WITHOUT re-scanning either input — union sketch =
  // bottom-k of the two sketches' union (exact by the bottom-k
  // identity), intersection via the ρ/k Jaccard estimator scaled by
  // the union estimate. This is how audience-overlap questions run at
  // 100 TB: each segment is sketched once in its own pass (2 KB
  // partial state per map task, no distinct exchange — sk7's shape),
  // and every pairwise overlap after that is array arithmetic on
  // 256-long sketches. Sketch-not-full branch returns the exact count
  // (kk), the standard KMV estimator contract. The exact union /
  // intersection anchors ride along for the error audit. All-integer:
  // the estimate itself hash-gates against the oracle's independent
  // bottom-k recomputation.
  def sk9(spark: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(graft.functions.KmvAggregator.Kmv(256),
      org.apache.spark.sql.Encoders.scalaLong)
    val ev = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    def hv = (((col("user_id") % 67108864L) * 2654435761L) % 4294967296L)
      .as("hv")
    val ka = ev.filter(col("event_type") === lit("view")).select(hv)
      .agg(kmv(col("hv")).as("ka"))
    val kb = ev.filter(col("event_type") === lit("click")).select(hv)
      .agg(kmv(col("hv")).as("kb"))
    val exact = ev.filter(col("event_type").isin("view", "click"))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === lit("view"), 1).otherwise(0)).as("iv"),
        max(when(col("event_type") === lit("click"), 1).otherwise(0)).as("ic"))
      .agg(count(lit(1)).as("n_exact_union"),
        sum(when(col("iv") === 1 && col("ic") === 1, 1L).otherwise(0L))
          .as("n_exact_inter"))
    ka.crossJoin(kb).crossJoin(broadcast(exact)) // three 1-row frames
      .withColumn("u",
        slice(array_sort(array_distinct(concat(col("ka"), col("kb")))), 1, 256))
      .select(col("n_exact_union"), col("n_exact_inter"),
        // try_: ANSI element_at errors on an empty union (kk = 0); a
        // NULL kth is only ever read under the kk >= 256 branch below
        expr("try_element_at(u, -1)").as("kth"),
        size(col("u")).cast("long").as("kk"),
        expr("cast(size(filter(u, x -> array_contains(ka, x)" +
          " AND array_contains(kb, x))) as bigint)").as("rho"))
      .withColumn("est_union",
        when(col("kk") < 256L, col("kk"))
          .otherwise(expr("(kk - 1) * 4294967296L div kth")))
      .select(col("n_exact_union"), col("n_exact_inter"), col("est_union"),
        when(col("kk") < 256L, col("rho"))
          .otherwise(expr("rho * est_union div kk")).as("est_inter"),
        // kk = 0 (both populations empty) guard: Spark's non-ANSI div
        // yields NULL on /0 while DuckDB's // errors — define the
        // empty-sketch Jaccard as 0 explicitly on BOTH sides
        when(col("kk") === 0L, lit(0L))
          .otherwise(expr("rho * 1000000L div kk")).as("jaccard_ppm"))
  }

  private val sk9Sql =
    """WITH e AS (
      |  SELECT DISTINCT event_type,
      |    ((user_id % 67108864) * 2654435761) % 4294967296 AS hv
      |  FROM events
      |  WHERE user_id IS NOT NULL AND event_type IN ('view', 'click')),
      |a AS (SELECT hv FROM e WHERE event_type = 'view' ORDER BY hv LIMIT 256),
      |b AS (SELECT hv FROM e WHERE event_type = 'click' ORDER BY hv LIMIT 256),
      |u AS (
      |  SELECT DISTINCT hv
      |  FROM (SELECT hv FROM a UNION ALL SELECT hv FROM b) ab
      |  ORDER BY hv LIMIT 256),
      |t AS (
      |  SELECT CAST(MAX(hv) AS BIGINT) AS kth, COUNT(*) AS kk,
      |    CAST(COALESCE(SUM(CASE WHEN hv IN (SELECT hv FROM a)
      |      AND hv IN (SELECT hv FROM b) THEN 1 ELSE 0 END), 0) AS BIGINT)
      |      AS rho
      |  FROM u),
      |x AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_union,
      |    CAST(SUM(CASE WHEN iv = 1 AND ic = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_exact_inter
      |  FROM (SELECT user_id,
      |          MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS iv,
      |          MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ic
      |        FROM events
      |        WHERE user_id IS NOT NULL AND event_type IN ('view', 'click')
      |        GROUP BY user_id) f)
      |SELECT n_exact_union, n_exact_inter,
      |  CAST(CASE WHEN kk < 256 THEN kk
      |    ELSE (kk - 1) * 4294967296 // kth END AS BIGINT) AS est_union,
      |  CAST(CASE WHEN kk < 256 THEN rho
      |    ELSE rho * ((kk - 1) * 4294967296 // kth) // kk END AS BIGINT)
      |    AS est_inter,
      |  CAST(CASE WHEN kk = 0 THEN 0 ELSE rho * 1000000 // kk END
      |    AS BIGINT) AS jaccard_ppm
      |FROM t CROSS JOIN x""".stripMargin

  // ---------------------------------------------------------------------
  // sk10_ddsketch — RELATIVE-ERROR quantiles via the exponential-bucket
  // sketch (DDSketch, Masson et al. VLDB 2019; exponential histograms
  // generally): values map to bucket ⌊log_γ v⌋ and the q-quantile is
  // answered from cumulative bucket counts with multiplicative error ≤
  // (γ−1)/(γ+1) — the OTHER quantile-sketch guarantee next to sk1's KLL
  // (rank error): KLL's rank bound degrades to huge VALUE error on
  // heavy tails, DDSketch's value bound is scale-free. γ = √2 so the
  // bucket index is INTEGER-EXACT in both engines — i = ⌊2·log₂ v⌋ =
  // bitlength(v²) − 1 (the v27/t36 bin-length trick; v = integer
  // cents) — no float log ever computed, so the sketch is
  // deterministic and the gate hash-checks the estimates directly
  // (like CMS/Bloom/KMV; unlike HLL/KLL's in-bounds anchors). The
  // oracle rebuilds the identical sketch in SQL. Per quantile
  // {50,90,99}: the sketch bucket, its count, the exact disc quantile
  // (shared integer rank rule: smallest v with cum ≥ ⌈q·n/100⌉), and
  // the guarantee booleans — exact value inside the bucket's
  // [2^(i/2), 2^((i+1)/2)) range, stated as integer v² comparisons.
  // Scale shape: the sketch IS groupBy(bucket).count() — map-side
  // partial over ~64 buckets, one KB-scale exchange, mergeable by
  // construction (bucket-count addition); the exact-quantile audit
  // column aggregates distinct cents values (bounded by price domain).
  def sk10(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.lineitem(spark, dir)
      .select(floor(col("l_extendedprice") * 100).cast("long").as("v"))
      .filter(col("v") > 0)
    val bucketed = cents
      .select(col("v"),
        (length(bin(col("v") * col("v"))) - 1).cast("long").as("b"))
    val hist = bucketed.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    // The sketch IS the histogram, and the histogram is ≤127 rows BY
    // CONSTRUCTION (b = bitlength(v²)−1 of a positive long < 127)
    // whatever the data volume — that bound is DDSketch's whole point.
    // Answering the 3 quantile probes is therefore a driver-side fold
    // over the collected sketch (the CMS-anchor bounded-collect class),
    // not a distributed plan: the earlier crossJoin(qs)+filter shape
    // planned 2 BroadcastNestedLoopJoins and an unpartitioned window
    // over data-sized frames. n rides the same collect (Σ bucket
    // counts ≡ cents.count(), the post-filter frame has no nulls)
    // instead of a second scan.
    val histRows = hist.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = histRows.map(_._2).sum
    val qs = Seq(50L, 90L, 99L)
    val rank = qs.map(q => q -> math.ceil(q * n / 100.0).toLong).toMap
    // first bucket whose cumulative count reaches the rank, + its count
    val skb: Map[Long, (Long, Long)] = qs.flatMap { q =>
      var cum = 0L
      histRows.collectFirst {
        case (b, cnt) if { cum += cnt; cum >= rank(q) } => q -> (b, cnt)
      }
    }.toMap
    // exact disc quantile under the SAME rank rule, over value counts:
    // distributed prefix sum (value cardinality grows with data — never
    // a single-partition window), then one conditional-min aggregate —
    // no per-quantile join against the data.
    val vals = cents.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val cumv = RelationalQueries.globalPrefixSum(
      vals, Seq(col("v")), col("c"), "cum")
    val qsHit = qs.filter(skb.contains)
    val exactRow = cumv.agg(
      min(when(col("cum") >= rank(qs.head), col("v"))).as(s"ev_${qs.head}"),
      qs.tail.map(q =>
        min(when(col("cum") >= rank(q), col("v"))).as(s"ev_$q")): _*)
    if (qsHit.isEmpty) // empty input: same empty shape the join plan gave
      exactRow.select(lit(0L).as("q"), lit(0L).as("sk_bucket"),
        lit(0L).as("bucket_n"), lit(0L).as("exact_v"),
        lit(false).as("in_bucket")).limit(0)
    else exactRow.select(explode(array(qsHit.map { q =>
        val (b, bn) = skb(q)
        struct(lit(q).as("q"), lit(b).as("sk_bucket"), lit(bn).as("bucket_n"),
          col(s"ev_$q").as("exact_v"))
      }: _*)).as("r"))
      .select(col("r.q").as("q"), col("r.sk_bucket").as("sk_bucket"),
        col("r.bucket_n").as("bucket_n"), col("r.exact_v").as("exact_v"),
        // guarantee: 2^sk_bucket <= exact_v^2 < 2^(sk_bucket+1), i.e.
        // the exact quantile lies in the sketch bucket's value range
        (length(bin(col("r.exact_v") * col("r.exact_v"))) - 1 ===
          col("r.sk_bucket")).as("in_bucket"))
      .orderBy(col("q"))
  }

  private val sk10Sql =
    """WITH cents AS (
      |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
      |  FROM lineitem WHERE floor(l_extendedprice * 100) > 0),
      |p AS (SELECT COUNT(*) AS n FROM cents),
      |hist AS (
      |  SELECT length(bin(v * v)) - 1 AS b, COUNT(*) AS cnt
      |  FROM cents GROUP BY 1),
      |cum AS (
      |  SELECT b, cnt, SUM(cnt) OVER (ORDER BY b
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM hist),
      |qs(q) AS (VALUES (CAST(50 AS BIGINT)), (CAST(90 AS BIGINT)),
      |                 (CAST(99 AS BIGINT))),
      |sk AS (
      |  SELECT q, MIN(b) AS sk_bucket
      |  FROM qs, cum, p
      |  WHERE cum >= CAST(ceil(q * n / 100.0) AS BIGINT)
      |  GROUP BY q),
      |vals AS (
      |  SELECT v, SUM(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM (SELECT v, COUNT(*) AS c FROM cents GROUP BY v)),
      |ex AS (
      |  SELECT q, MIN(v) AS exact_v
      |  FROM qs, vals, p
      |  WHERE cum >= CAST(ceil(q * n / 100.0) AS BIGINT)
      |  GROUP BY q)
      |SELECT sk.q, CAST(sk.sk_bucket AS BIGINT) AS sk_bucket,
      |  CAST(h.cnt AS BIGINT) AS bucket_n, ex.exact_v,
      |  (length(bin(ex.exact_v * ex.exact_v)) - 1 = sk.sk_bucket)
      |    AS in_bucket
      |FROM sk JOIN ex ON sk.q = ex.q
      |JOIN hist h ON h.b = sk.sk_bucket
      |ORDER BY sk.q""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk10_ddsketch" -> (sk10 _),
    "sk9_kmv_setops" -> (sk9 _),
    "sk8_bitmap_distinct" -> (sk8 _),
    "sk7_kmv" -> (sk7 _),
    "sk6_bloom_fpr" -> (sk6 _),
    "sk5_cms_heavy" -> (sk5 _),
    "sk4_hll_intersect" -> (sk4 _),
    "sk1_sketches" -> (sk1 _),
    "sk2_hll_union" -> (sk2 _),
    "sk3_heavy_hitters" -> (sk3 _))

  /** Exact anchors hash-checked; sketch accuracy asserted via the
    * in-bounds booleans the oracle pins to TRUE. */
  val oracleSql: Map[String, String] = Map(
    "sk10_ddsketch" -> sk10Sql,
    "sk9_kmv_setops" -> sk9Sql,
    "sk8_bitmap_distinct" -> sk8Sql,
    "sk7_kmv" -> sk7Sql,
    "sk6_bloom_fpr" -> sk6Sql,
    "sk5_cms_heavy" -> sk5Sql,
    "sk4_hll_intersect" -> sk4Sql,
    "sk1_sketches" -> sk1Sql,
    "sk2_hll_union" -> sk2Sql,
    "sk3_heavy_hitters" -> sk3Sql)
}
