package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing at the bench configuration (local[32],
  * noop sink, 3 runs: cold + 2 warm): `runMain graft.tools.BenchOne
  * <sfDir> <query…>`. Development tool — the driver's bench surface is
  * graft.Bench; this exists for iterating on one query's plan without
  * paying the full-suite run.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    args.drop(1).foreach { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).write.mode("overwrite")
          .format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
