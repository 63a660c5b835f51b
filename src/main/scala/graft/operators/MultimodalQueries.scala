package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal binary-column operators. m1 (pure plumbing: blob synth,
  * octet length, content digest, metadata) is oracle-checked; m2 runs
  * the typed mapPartitions decode/feature stage whose codec is a stub —
  * the driver records the weaker rows-only check for it (no oracleSql
  * entry), as stub decode output has no SQL equivalent.
  */
object MultimodalQueries {

  // ---------------------------------------------------------------------
  // m1_media_meta — binary column + typed metadata plumbing, per kind.
  def m1(spark: SparkSession, dir: String): DataFrame =
    Multimodal.synthesizeMedia(Tables.documents(spark, dir))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("content")).cast("long")).as("sum_bytes"),
        countDistinct(md5(col("content"))).as("n_distinct"),
        min(col("width")).as("min_w"),
        max(col("height")).as("max_h"),
        sum(col("sample_rate").cast("long")).as("sum_rate"))
      .orderBy(col("kind"))

  private val m1Sql =
    """WITH media AS (
      |  SELECT doc_id AS media_id, text,
      |    CASE WHEN n_chars % 3 = 0 THEN 'image'
      |         WHEN n_chars % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    encode(text) AS content,
      |    CAST(n_chars % 640 + 16 AS INTEGER) AS width,
      |    CAST(n_chars % 480 + 16 AS INTEGER) AS height,
      |    CASE WHEN n_chars % 2 = 0 THEN 16000 ELSE 44100 END AS sample_rate
      |  FROM documents)
      |SELECT kind, COUNT(*) AS n,
      |  CAST(SUM(octet_length(content)) AS BIGINT) AS sum_bytes,
      |  COUNT(DISTINCT md5(text)) AS n_distinct,
      |  MIN(width) AS min_w, MAX(height) AS max_h,
      |  CAST(SUM(sample_rate) AS BIGINT) AS sum_rate
      |FROM media GROUP BY kind ORDER BY kind""".stripMargin

  // ---------------------------------------------------------------------
  // m2_media_features — typed Dataset + mapPartitions batch decode
  // (stub codec): per-kind feature stats. Rows-only check by design.
  def m2(spark: SparkSession, dir: String): DataFrame =
    Multimodal.featuresFromDocuments(spark, Tables.documents(spark, dir))
      .toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("sum_bytes"),
        sum(col("frames_sampled").cast("long")).as("sum_frames"),
        sum(element_at(col("byte_histogram"), 7)).as("hist_bin6"),
        min(col("checksum")).as("min_checksum"),
        max(col("checksum")).as("max_checksum"))
      .orderBy(col("kind"))

  // ---------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_meta" -> (m1 _),
    "m2_media_features" -> (m2 _))

  /** m2 intentionally absent: stub-codec output is not SQL-expressible;
    * the driver records a rows-only check for it. */
  val oracleSql: Map[String, String] = Map(
    "m1_media_meta" -> m1Sql)
}
