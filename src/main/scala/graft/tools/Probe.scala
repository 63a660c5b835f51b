package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing probe: `runMain graft.tools.Probe <sfDir> <query…>`
  * prints formatted plans and per-query wall times for the named
  * SparkEntry queries (all when none given). Development tool — not part
  * of the driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      if (sys.env.contains("PROBE_EXPLAIN")) df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      val t1 = System.nanoTime()
      val n2 = df.count()
      val t2 = System.nanoTime()
      println(f"$name%-24s rows=$n%-8d first=${(t1 - t0) / 1e9}%.2fs warm=${(t2 - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
