package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-table column profiler — the data-quality primitive every
  * large-scale ingest runs before trusting a drop: per column, row
  * count, null count, distinct count, and string-collation min/max.
  * (The reference's validation jobs hand-roll per-column counts for the
  * columns they check; this is the generalized one-pass form, SURVEY.md
  * §2.3/§2.5.)
  *
  * Shape: values UNPIVOT map-side (one `explode` of a literal-keyed
  * struct array — rows × |cols|, never materialized past the partial
  * aggregate), then one aggregation keyed by column name. All values
  * profile through a string cast so every column type shares one agg —
  * min/max are therefore COLLATION minima (both engines compare the
  * same strings, so the oracle agrees byte-for-byte; numeric min/max
  * belong to the typed rules, F5).
  *
  * Scale notes: the |cols|-key groupBy would be a 9-reducer bottleneck,
  * but `countDistinct` rewrites to a two-level plan keyed first by
  * (col_name, value) — the wide shuffle carries the distinct pairs with
  * map-side partial dedup, and the final 9-key exchange only merges
  * per-column partials. High-NDV columns therefore spread across the
  * cluster instead of piling on one task; at 100 TB swap the exact
  * distinct for approx_count_distinct and the same plan drops the wide
  * exchange entirely (kept exact here for the oracle).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val pairs = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("val"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.val"))
    pairs.groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("val")).as("n_distinct"),
        min(col("val")).as("min_s"),
        max(col("val")).as("max_s"))
      .orderBy(col("col_name"))
  }
}
