package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Table access for the driver-generated test datasets (TESTDATA.md).
  *
  * All queries take a scale-factor directory (`/root/testdata/sfN/`) and
  * read one parquet file per table. Reads are plain `spark.read.parquet`
  * so Catalyst gets full pushdown/pruning; nothing is cached here — each
  * query owns its own plan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "events")

  /** Internal convention: `events.ts` is an epoch-NANOS BIGINT (the shape
    * the original TIMESTAMP(NANOS) parquet took under `nanosAsLong`, which
    * every downstream operator's micros arithmetic builds on). Data dirs
    * may instead store `ts` as a native TIMESTAMP/TIMESTAMP_NTZ at micros
    * precision; normalize here so both shapes read identically. The
    * session timezone is pinned UTC, so the NTZ→TZ cast is value-preserving,
    * and `unix_micros * 1000` is exact long arithmetic (no double rounding).
    * Gates never filter on raw `ts` at the scan (they derive `tsu`/event-
    * time first), so rewriting the column costs no parquet pushdown. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case _ => df.withColumn("ts", tsToNanos(col("ts")))
  }

  /** Timestamp column → epoch-nanos BIGINT (exact: micros long × 1000). */
  def tsToNanos(c: Column): Column = unix_micros(c.cast(TimestampType)) * lit(1000L)
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
