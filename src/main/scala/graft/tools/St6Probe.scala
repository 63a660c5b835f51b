package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: dump st5/st6 gate results to parquet for oracle pinning. */
object St6Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "/tmp/st6_out"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.StreamingQueries.st6(spark, sfDir)
      .write.mode("overwrite").parquet(s"$out/st6")
    graft.operators.StreamingQueries.st5(spark, sfDir)
      .write.mode("overwrite").parquet(s"$out/st5")
    spark.stop()
  }
}
