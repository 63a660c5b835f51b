package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.similarity.Similarity

/** Cross-table pipeline queries: the shapes a training-data curation job
  * actually runs — text signals joined to embedding signals, and
  * event-sequence analytics.
  */
object CrossQueries {

  // ---------------------------------------------------------------------
  // x1_docs_embeddings — join the text table to its embedding table
  // (doc_id == vec_id) and aggregate quality × geometry per language:
  // the "curation dashboard" query. Both sides map-side; one small agg.
  def x1(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).as("toks"))
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        Similarity.dotScaled(
          Similarity.scaled(col("embedding")), Similarity.scaled(col("embedding"))).as("nrm"),
        Similarity.signBucket(col("embedding"), 3).as("bucket"))
    docs.join(vecs, col("doc_id") === col("vec_id"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("toks")).as("sum_tokens"),
        sum(col("nrm")).as("sum_nrm"),
        countDistinct(col("bucket")).as("n_buckets"))
      .orderBy(col("lang"))
  }

  private val x1Sql =
    """WITH v AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS sv,
      |    (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END)
      |    + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
      |    + (CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS bucket
      |  FROM embeddings),
      |n AS (SELECT vec_id, bucket,
      |        list_aggregate(list_transform(sv, x -> x * x), 'sum') AS nrm FROM v)
      |SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
      |  CAST(SUM(nrm) AS BIGINT) AS sum_nrm,
      |  COUNT(DISTINCT bucket) AS n_buckets
      |FROM documents JOIN n ON doc_id = vec_id
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // x2_funnel — ordered event-sequence detection (view → click →
  // purchase) via conditional min timestamps: one aggregation, no
  // self-joins. Event time in micros (nanos truncate identically).
  def x2(spark: SparkSession, dir: String): DataFrame = {
    val tsu = graft.streaming.Streaming.tsMicros(col("ts"))
    val m = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", tsu)).as("v"),
        min(when(col("event_type") === "click", tsu)).as("c"),
        min(when(col("event_type") === "purchase", tsu)).as("p"),
        count(lit(1)).as("n_events"))
    m.select(
        col("user_id"), col("n_events"),
        (col("v") < col("c") && col("c") < col("p")).as("converted"))
      .filter(col("converted"))
      .select(col("user_id"), col("n_events"))
      .orderBy(col("user_id"))
  }

  private val x2Sql =
    """WITH m AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
      |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY user_id)
      |SELECT user_id, n_events FROM m
      |WHERE v < c AND c < p ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // x3_intersect — set-op completion (§2.7 lists union/except; intersect
  // rounds out the library): high-value customers present in BOTH years.
  def x3(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val y96 = o.filter(year(col("o_orderdate")) === 1996 && col("o_totalprice") > 200000.0)
      .select(col("o_custkey"))
    val y97 = o.filter(year(col("o_orderdate")) === 1997 && col("o_totalprice") > 200000.0)
      .select(col("o_custkey"))
    y96.intersect(y97).orderBy(col("o_custkey"))
  }

  private val x3Sql =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 AND o_totalprice > 200000.0
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997 AND o_totalprice > 200000.0
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // x4_skyline — Pareto-optimal customers on (total spend, order count):
  // the skyline operator over an aggregated (dimension-sized) input, so
  // the anti-join form is the right plan. Exact decimal spend keeps the
  // dominance comparisons engine-identical.
  def x4(spark: SparkSession, dir: String): DataFrame = {
    val stats = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(RelationalQueries.dsum(col("o_totalprice")).as("spend"),
        count(lit(1)).cast("double").as("n_orders"))
    Skyline.antiJoin(stats, Seq("spend", "n_orders"))
      .orderBy(col("o_custkey"))
  }

  private val x4Sql =
    """WITH stats AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend,
      |    CAST(COUNT(*) AS DOUBLE) AS n_orders
      |  FROM orders GROUP BY o_custkey)
      |SELECT * FROM stats x
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM stats y
      |  WHERE y.spend >= x.spend AND y.n_orders >= x.n_orders
      |    AND (y.spend > x.spend OR y.n_orders > x.n_orders))
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_docs_embeddings" -> (x1 _),
    "x2_funnel" -> (x2 _),
    "x3_intersect" -> (x3 _),
    "x4_skyline" -> (x4 _))

  val oracleSql: Map[String, String] = Map(
    "x1_docs_embeddings" -> x1Sql,
    "x2_funnel" -> x2Sql,
    "x3_intersect" -> x3Sql,
    "x4_skyline" -> x4Sql)
}
