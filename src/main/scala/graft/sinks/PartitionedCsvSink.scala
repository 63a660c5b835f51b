package graft.sinks

import org.apache.spark.sql.DataFrame

/** S4/S5 — Hive-style partitioned CSV write, quoting disabled, header on
  * (SURVEY.md §2.1). The reference writes `opco_id=NNN/` directories with
  * `quoteChar: -1`
  * (`/root/reference/src/price_zone/transform_spark_job.py:107-111`), and
  * the PA pipeline's pandas groupby→to_csv per opco
  * (`/root/reference/src/pa/pa_etl_script.py:122-126,285-296`) is exactly
  * the same partitioned write — the partition column is elided from file
  * contents, matching PA's `del final_df['opco_id']`.
  *
  * Scale notes: `partitionBy` is a shuffle-free write when upstream is
  * already keyed; `maxRecordsPerFile` bounds file size at 100 TB so a
  * hot partition can't produce a monolithic file. Callers that need one
  * file per group can `repartition(groupCols…)` first (one shuffle, then
  * fully parallel writes).
  */
object PartitionedCsvSink {

  def write(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L,
      /** One shuffle keyed on the partition columns before the write:
        * yields one file per group (the reference's S5 one-CSV-per-opco
        * contract) instead of files-per-task-per-group; leave false for
        * maximum write parallelism. */
      singleFilePerGroup: Boolean = false): Unit = {
    val out =
      if (singleFilePerGroup)
        df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df
    out.write
      .partitionBy(partitionCols: _*)
      .option("header", "true")
      // emptyValue "" keeps empty strings distinguishable from the quote
      // default; quoting off matches the reference's quoteChar: -1.
      .option("quoteAll", "false")
      .option("emptyValue", "")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .csv(path)
  }
}
