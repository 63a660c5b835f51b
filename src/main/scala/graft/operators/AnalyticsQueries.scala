package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Customer/corpus analytics gates: the standing BI-layer queries a
  * warehouse team runs on top of the fact tables, plus the asymmetric
  * (containment) variant of near-dup detection for the curation layer.
  *
  * Shared conventions (established rounds 1–5): money in exact BIGINT
  * cents (`floor(price*100)` — IEEE-stable across engines), ratios in
  * integer ppm via `div`, global rankings through
  * [[RelationalQueries.globalRank]] (never a single-partition window),
  * 1-row scalar ride-alongs via broadcast crossJoin.
  */
object AnalyticsQueries {

  // ---------------------------------------------------------------------
  // q40_rfm — RFM (recency/frequency/monetary) customer segmentation:
  // rank customers on each metric, cut into exact arithmetic quintiles,
  // and report the populated (r,f,m) cells with a named segment. The
  // classic CRM scoring query (the reference's own per-opco summaries
  // are the same shape one level down).
  //
  // Scale shape: the ranked table is CUSTOMER-cardinality (already
  // aggregated from orders), and each of the three rankings is a
  // globalRank — range-partition + per-partition offsets, so no
  // single-reducer window even at 10^8 customers. Quintile = arithmetic
  // ((rank-1)*5) div n (q29's convention — ntile's remainder placement
  // is engine-defined, this form is not). Scores are oriented so 5 is
  // always "best": recency ranks ascending by days-since-last-order
  // (rank 1 = freshest → score 5), frequency/monetary rank ascending
  // (highest rank → score 5).
  def q40(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_dt"),
        count(lit(1)).as("freq"),
        sum(col("cents")).as("monetary_cents"))
    // Recency ranks directly on last_dt DESC: days-since-reference is a
    // monotone-decreasing function of last_dt, so the rank (all the
    // quintile needs) is identical and the reference-date scalar never
    // enters the rank subtrees — keeping the single 1-row broadcast at
    // the END of the chain instead of replicated 2^3 times through the
    // three globalRanks' offset branches.
    val ranked = Seq(
      ("r_rnk", Seq(col("last_dt").desc, col("o_custkey"))),
      ("f_rnk", Seq(col("freq").asc, col("o_custkey").asc)),
      ("m_rnk", Seq(col("monetary_cents").asc, col("o_custkey").asc)))
      .foldLeft(per) { case (df, (out, keys)) =>
        RelationalQueries.globalRank(df, keys, out)
      }
    val n = per.agg(count(lit(1)).as("n_cust"))
    ranked.crossJoin(broadcast(n)) // 1-row scalar ride-along
      .withColumn("r_score", expr("5 - ((r_rnk - 1) * 5) div n_cust"))
      .withColumn("f_score", expr("((f_rnk - 1) * 5) div n_cust + 1"))
      .withColumn("m_score", expr("((m_rnk - 1) * 5) div n_cust + 1"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
          .when(col("r_score") >= 4, "recent")
          .when(col("f_score") >= 4, "loyal_lapsing")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "at_risk")
          .otherwise("mid"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"), col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary_cents")).as("cell_cents"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  private val q40Sql =
    """WITH per AS (
      |  SELECT o_custkey, max(o_orderdate) AS last_dt, count(*) AS freq,
      |    SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS monetary_cents
      |  FROM orders GROUP BY 1),
      |ref AS (SELECT count(*) AS n_cust FROM per),
      |b AS (SELECT per.*, n_cust FROM per CROSS JOIN ref),
      |rk AS (SELECT *,
      |  ROW_NUMBER() OVER (ORDER BY last_dt DESC, o_custkey) AS r_rnk,
      |  ROW_NUMBER() OVER (ORDER BY freq, o_custkey) AS f_rnk,
      |  ROW_NUMBER() OVER (ORDER BY monetary_cents, o_custkey) AS m_rnk
      |  FROM b),
      |s AS (SELECT monetary_cents,
      |  5 - ((r_rnk - 1) * 5) // n_cust AS r_score,
      |  ((f_rnk - 1) * 5) // n_cust + 1 AS f_score,
      |  ((m_rnk - 1) * 5) // n_cust + 1 AS m_score
      |  FROM rk)
      |SELECT r_score, f_score, m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
      |       WHEN r_score >= 4 THEN 'recent'
      |       WHEN f_score >= 4 THEN 'loyal_lapsing'
      |       WHEN r_score <= 2 AND f_score <= 2 THEN 'at_risk'
      |       ELSE 'mid' END AS segment,
      |  COUNT(*) AS n_customers,
      |  CAST(SUM(monetary_cents) AS BIGINT) AS cell_cents
      |FROM s GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------------
  // x28_seasonality — ISO-day-of-week seasonal index of order revenue:
  // each weekday's share of revenue vs a flat week, in exact ppm
  // (1_000_000 = an average day). Weekday via Spark `weekday` (0=Mon)
  // + 1 == DuckDB `isodow` (1=Mon) — engine-portable, unlike
  // Sunday-anchored dayofweek. The ×7e6 numerator rides DECIMAL(38,0)
  // (t16's convention) so the index stays exact even when the corpus
  // total overflows BIGINT×7e6 at warehouse scale. 7-row result at any
  // scale; one partial-agg pass over orders.
  def x28(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .select((weekday(col("o_orderdate")) + lit(1)).as("isodow"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("isodow"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("dow_cents"))
    val tot = per.agg(sum(col("dow_cents")).as("total_cents"))
    per.crossJoin(broadcast(tot)) // 1-row scalar ride-along
      .withColumn("index_ppm", expr(
        "cast((cast(dow_cents AS DECIMAL(38,0)) * 7000000) div total_cents AS BIGINT)"))
      .select(col("isodow"), col("n_orders"), col("dow_cents"), col("index_ppm"))
      .orderBy(col("isodow"))
  }

  private val x28Sql =
    """WITH per AS (
      |  SELECT isodow(o_orderdate) AS isodow, COUNT(*) AS n_orders,
      |    SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS dow_cents
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT SUM(dow_cents) AS total_cents FROM per)
      |SELECT isodow, n_orders, CAST(dow_cents AS BIGINT) AS dow_cents,
      |  CAST((CAST(dow_cents AS HUGEINT) * 7000000) // total_cents AS BIGINT)
      |    AS index_ppm
      |FROM per CROSS JOIN tot ORDER BY isodow""".stripMargin

  // ---------------------------------------------------------------------
  // x29_rolling_wau — rolling 7-day active users per day (the WAU
  // curve). An expanding distinct has a first-seen rewrite (q35); a
  // SLIDING distinct does not, so the honest exact shape is a bounded
  // map-side fan-out: each distinct (user, day) contributes to the 7
  // window-end days it can influence, then one distinct + count per
  // day. Exchanges carry user-day × 7 rows (never raw events — the
  // first distinct collapses event volume at the map side), and the
  // fan-out factor is the window length, fixed by the metric, not by
  // data. Day numbers are exact integer micros-div (x22's convention).
  def x29(spark: SparkSession, dir: String): DataFrame = {
    val tsu = graft.streaming.Streaming.tsMicros(col("ts"))
    val ud = Tables.events(spark, dir).filter(col("ts").isNotNull)
      .select(col("user_id"),
        tsu.cast("long").as("tsu"))
      .select(col("user_id"), expr("tsu div 86400000000").as("day"))
      .distinct()
    val bounds = ud.agg(min(col("day")).as("min_day"), max(col("day")).as("max_day"))
    val contrib = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(6L))).as("day_num"))
      .distinct() // a user active on several days of one window counts once
    contrib.crossJoin(broadcast(bounds)) // 1-row scalar ride-along
      .filter(col("day_num") <= col("max_day")) // min-bound windows are partial but real
      .filter(col("day_num") >= col("min_day"))
      .groupBy(col("day_num"))
      .agg(count(lit(1)).as("wau"))
      .orderBy(col("day_num"))
  }

  private val x29Sql =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events WHERE ts IS NOT NULL),
      |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
      |c AS (SELECT DISTINCT user_id, day + k AS day_num
      |      FROM ud CROSS JOIN range(0, 7) t(k))
      |SELECT day_num, COUNT(*) AS wau
      |FROM c CROSS JOIN b WHERE day_num BETWEEN mn AND mx
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // d16_containment — ASYMMETRIC near-dup detection: containment
  // C(A→B) = |S_A ∩ S_B| / |S_A| over 3-gram shingles, the measure that
  // finds quotes/subsets that Jaccard misses (a short doc wholly inside
  // a long one has low Jaccard but containment 1). The measure is
  // defined over the DISCRIMINATIVE shingle universe (document
  // frequency ≤ 20): hot boilerplate shingles both blow up candidate
  // generation quadratically AND carry no containment signal, so
  // df-capping is part of the operator's contract, not an
  // approximation — the oracle applies the identical cap.
  //
  // Scale shape: one shingle-hash explode (8-byte longs, d4's kernel —
  // grams never shuffle), df aggregate, then a shingle-keyed self-join
  // whose per-key fan-out is bounded by the df cap (≤ 20 docs → ≤ 380
  // directed pairs per shingle). Both join sides read the SAME
  // repartition subtree, so ReuseExchange scans + explodes once.
  def d16(spark: SparkSession, dir: String): DataFrame = {
    val maxDf = 20
    val ds = Tables.documents(spark, dir).select(col("doc_id"),
      explode(Dedup.shingleHashesExpr(col("text"), 3)).as("sh"))
    val dfreq = ds.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val rare = ds.join(dfreq, "sh").select(col("doc_id"), col("sh"))
      .repartition(col("sh"))
    val sizes = rare.groupBy(col("doc_id")).agg(count(lit(1)).as("na"))
    val pairs = rare.select(col("doc_id").as("doc_a"), col("sh"))
      .join(rare.select(col("doc_id").as("doc_b"), col("sh")), "sh")
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
    pairs.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .withColumn("containment_ppm", expr("(shared * 1000000) div na"))
      .filter(col("containment_ppm") >= 600000)
      .select(col("doc_a"), col("doc_b"), col("shared"), col("na"),
        col("containment_ppm"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val d16Sql =
    """WITH d AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |      range(1, greatest(len(string_split(text,' ')) - 2, 0) + 1),
      |      i -> array_to_string(list_slice(string_split(text,' '), i, i + 2), ' '))) AS sh
      |  FROM documents),
      |e AS (SELECT doc_id, unnest(sh) AS g FROM d),
      |f AS (SELECT g FROM e GROUP BY g HAVING count(*) <= 20),
      |r AS (SELECT e.doc_id, e.g FROM e JOIN f USING (g)),
      |sz AS (SELECT doc_id, count(*) AS na FROM r GROUP BY 1),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |      FROM r a JOIN r b ON a.g = b.g AND a.doc_id <> b.doc_id
      |      GROUP BY 1, 2)
      |SELECT doc_a, doc_b, shared, na,
      |  (shared * 1000000) // na AS containment_ppm
      |FROM p JOIN sz ON sz.doc_id = p.doc_a
      |WHERE (shared * 1000000) // na >= 600000
      |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_rfm" -> (q40 _),
    "x28_seasonality" -> (x28 _),
    "x29_rolling_wau" -> (x29 _),
    "d16_containment" -> (d16 _))

  val oracleSql: Map[String, String] = Map(
    "q40_rfm" -> q40Sql,
    "x28_seasonality" -> x28Sql,
    "x29_rolling_wau" -> x29Sql,
    "d16_containment" -> d16Sql)
}
