package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** One-off probe for the d1_exact_dedup regression (VERDICT r2 item 1):
  * times alternative shapes with collect() (count() prunes aggregates —
  * NOTES_r1). Development tool, not part of the driver contract.
  */
object D1Probe {
  def fp(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("source"), col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("f"))

  /** r2 shape: (f, source) pre-aggregate, lazy localCheckpoint, two consumers. */
  def vCheckpoint(spark: SparkSession, dir: String): DataFrame = {
    val g = fp(spark, dir)
      .groupBy(col("f"), col("source"))
      .agg(count(lit(1)).as("c"), min(col("doc_id")).as("md"))
      .localCheckpoint(eager = false)
    val kept = g.groupBy(col("f"))
      .agg(min_by(col("source"), col("md")).as("keeper_source"))
      .groupBy(col("keeper_source")).agg(count(lit(1)).as("n_kept"))
      .withColumnRenamed("keeper_source", "source")
    g.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("n_docs"), count(col("f")).as("n_unique"))
      .join(kept, Seq("source"))
      .orderBy(col("source"))
  }

  /** r1 shape: two full fingerprint passes, no checkpoint. */
  def vTwoPass(spark: SparkSession, dir: String): DataFrame = {
    val f = fp(spark, dir)
    val kept = f.groupBy(col("f"))
      .agg(min_by(col("source"), col("doc_id")).as("keeper_source"))
      .groupBy(col("keeper_source")).agg(count(lit(1)).as("n_kept"))
      .withColumnRenamed("keeper_source", "source")
    f.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("f")).as("n_unique"))
      .join(kept, Seq("source"))
      .orderBy(col("source"))
  }

  /** r2 shape minus the checkpoint: recompute g per consumer. */
  def vNoCheckpoint(spark: SparkSession, dir: String): DataFrame = {
    val g = fp(spark, dir)
      .groupBy(col("f"), col("source"))
      .agg(count(lit(1)).as("c"), min(col("doc_id")).as("md"))
    val kept = g.groupBy(col("f"))
      .agg(min_by(col("source"), col("md")).as("keeper_source"))
      .groupBy(col("keeper_source")).agg(count(lit(1)).as("n_kept"))
      .withColumnRenamed("keeper_source", "source")
    g.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("n_docs"), count(col("f")).as("n_unique"))
      .join(kept, Seq("source"))
      .orderBy(col("source"))
  }

  /** One pass: (f, source) partial agg -> groupBy(f) collect per-source
    * stats + keeper -> explode -> final groupBy(source). Two shuffles,
    * no self-join, no checkpoint. */
  def vOnePass(spark: SparkSession, dir: String): DataFrame = {
    val perF = fp(spark, dir)
      .groupBy(col("f"), col("source"))
      .agg(count(lit(1)).as("c"), min(col("doc_id")).as("md"))
      .groupBy(col("f"))
      .agg(collect_list(struct(col("source"), col("c"))).as("per_src"),
        min_by(col("source"), col("md")).as("keeper_source"))
    perF
      .select(col("keeper_source"), explode(col("per_src")).as("e"))
      .select(col("e.source").as("source"), col("e.c").as("c"),
        (col("e.source") === col("keeper_source")).cast("long").as("is_keeper"))
      .groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("n_docs"), count(lit(1)).as("n_unique"),
        sum(col("is_keeper")).as("n_kept"))
      .orderBy(col("source"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the table + codegen paths once
    Tables.documents(spark, sfDir).count()

    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "floor_scan" -> ((s, d) => Tables.documents(s, d).agg(count(col("text")).as("n"))),
      "floor_fp" -> ((s, d) => fp(s, d).agg(max(col("f")).as("m"))),
      "checkpoint(r2)" -> vCheckpoint,
      "two_pass(r1)" -> vTwoPass,
      "no_checkpoint" -> vNoCheckpoint,
      "one_pass" -> vOnePass)
    variants.foreach { case (name, mk) =>
      // fresh DataFrame per timing so no caching carries over
      val t0 = System.nanoTime()
      val r1 = mk(spark, sfDir).collect()
      val t1 = System.nanoTime()
      val r2 = mk(spark, sfDir).collect()
      val t2 = System.nanoTime()
      println(f"$name%-16s rows=${r1.length}%-6d cold=${(t1 - t0) / 1e9}%6.2fs warm=${(t2 - t1) / 1e9}%6.2fs  head=${r1.headOption.map(_.toString).getOrElse("")}")
    }
    spark.stop()
  }
}
