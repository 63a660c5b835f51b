package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one ad-hoc SQL statement against the sf tables and print it:
  * `runMain graft.tools.SqlProbe <sfDir> <sql>`.
  * Development tool — not part of the driver contract. */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: SqlProbe <sfDir> <sql>")
    val (sfDir, sql) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      graft.Tables(spark, sfDir, t).createOrReplaceTempView(t)
    }
    spark.sql(sql).show(100, truncate = false)
    spark.stop()
  }
}
