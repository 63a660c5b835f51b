package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val gates = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.BenchSupport.warmup(spark, dir)
    for (p <- Seq("8", "4")) {
      spark.conf.set("spark.graft.streaming.shufflePartitions", p)
      gates.foreach { name =>
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, dir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          graft.BenchSupport.hygiene(spark)
          dt
        }
        println(f"[probe] p=$p $name%-24s ${times.map(t => f"$t%.2f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}
