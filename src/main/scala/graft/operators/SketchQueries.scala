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
  *  - `percentile_approx` = KLL-style quantile sketch: bounded state vs
  *    exact percentile's per-group sorted buffer.
  *
  * At 100 TB these are not approximations of the plan — they ARE the
  * plan: exact distinct-counting a billion-cardinality column is a
  * terabyte shuffle; the sketch is 32 KB per group.
  *
  * Sketch outputs are engine-specific (DuckDB's HLL differs), so these
  * queries carry NO DuckDB oracle: the driver records the weaker
  * rows-only check, and `SketchQueriesSpec` pins accuracy against exact
  * results (relative error well inside the configured rsd) plus
  * determinism across runs.
  */
object SketchQueries {

  /** sk1_sketches — per-source approximate profile of the documents
    * table next to cheap exact anchors (counts) so the spec can bound
    * the error without a second query. */
  def sk1(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.tokenCount(col("text")).as("toks"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col("fp"), 0.02).as("approx_unique"),
        percentile_approx(col("toks"), lit(0.5), lit(5000)).as("approx_p50_toks"),
        percentile_approx(col("toks"), lit(0.95), lit(5000)).as("approx_p95_toks"))
      .orderBy(col("source"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk1_sketches" -> (sk1 _))

  /** No oracle by design: sketch values are engine-specific. */
  val oracleSql: Map[String, String] = Map.empty
}
