package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table sink for co-located joins (SURVEY.md §4.2 partitioning
  * row; the 100 TB path for repeated large-×-large equi-joins).
  *
  * Writing both sides bucketed by the join key with the same bucket
  * count pre-shuffles the data ONCE at write time; every subsequent join
  * or aggregation on that key runs with zero Exchange — at 100 TB the
  * difference between an hourly pipeline re-shuffling terabytes per run
  * and one that only scans. Requires a catalog table (`saveAsTable`);
  * plain path-based writes cannot carry bucket metadata.
  */
object BucketedSink {

  /** Drop a managed table AND its warehouse directory: a crashed prior
    * JVM leaves the dir behind with no catalog entry, which blocks the
    * next CREATE TABLE. Resolves the session's actual warehouse dir
    * rather than assuming `./spark-warehouse`. */
  def dropManaged(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new java.io.File(
      Option(wh.getPath).filter(_.nonEmpty).getOrElse(wh.toString),
      table.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(loc)
    }
  }

  /** Sorted buckets additionally remove the per-task Sort below every
    * SortMergeJoin — but only when (a) each bucket lands in ONE file,
    * which the repartition-on-key below guarantees (each task holds
    * exactly one bucket's rows; Spark distrusts multi-file buckets), and
    * (b) the reading session sets
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (since
    * Spark 3.1 the planner skips the planning-time file listing that
    * proves per-bucket sortedness unless asked; the shuffle elimination
    * itself needs no flag). */
  def write(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int,
      sortCol: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val one = df.repartition(buckets, df.col(bucketCol))
    val w = one.write.mode(mode).bucketBy(buckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).format("parquet").saveAsTable(table)
  }
}
