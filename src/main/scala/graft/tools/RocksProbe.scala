package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: st4/st5/st6 timings under the HDFS-backed vs RocksDB state
  * store providers (VERDICT r2 item 8). */
object RocksProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = Seq("st4_stream_stream", "st5_stateful_sessions", "st6_session_flows")
    for (store <- Seq("hdfs", "rocksdb", "hdfs", "rocksdb")) {
      spark.conf.set("spark.graft.streaming.stateStore", store)
      queries.foreach { name =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).collect().length
        val t1 = System.nanoTime()
        println(f"$store%-8s $name%-24s rows=$n%-8d ${(t1 - t0) / 1e9}%6.2fs")
      }
    }
    spark.stop()
  }
}
