package graft.tools

import org.apache.spark.sql.SparkSession

/** Like Probe but times collect() (count() prunes unused aggregate
  * expressions — NOTES_r1) and reports cold (fresh codegen) + warm
  * runs. `runMain graft.tools.CollectProbe <sfDir> <query…>`.
  */
object CollectProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // scale-path probes: SPARK_GRAFT_STATESTORE=rocksdb flips the
      // streaming state store the same way a cluster conf would
      .config("spark.graft.streaming.stateStore",
        sys.env.getOrElse("SPARK_GRAFT_STATESTORE", "hdfs"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).collect().length
      val t1 = System.nanoTime()
      val n2 = graft.SparkEntry.queries(name)(spark, sfDir).collect().length
      val t2 = System.nanoTime()
      println(f"$name%-24s rows=$n%-8d cold=${(t1 - t0) / 1e9}%6.2fs warm=${(t2 - t1) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
