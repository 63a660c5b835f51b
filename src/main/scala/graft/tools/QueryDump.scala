package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump named SparkEntry queries to parquet for ad-hoc oracle checks:
  * `runMain graft.tools.QueryDump <sfDir> <outDir> <query…>`.
  * Development tool — not part of the driver contract. */
object QueryDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QueryDump <sfDir> <outDir> <query...>")
    val (sfDir, out, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$out/$name")
      graft.SparkEntry.oracleSql.get(name).foreach { sql =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, s"$name.sql"),
          sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.stop()
  }
}
