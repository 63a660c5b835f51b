package graft.tools

import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` for named SparkEntry queries to
  * `<outDir>/<query><suffix>.txt` at the bench session configuration:
  * `runMain graft.tools.ExplainOne <sfDir> <outDir> <suffix> <query…>`.
  * Development tool backing the `plans/r09/` before/after artifacts —
  * not part of the driver contract. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ExplainOne <sfDir> <outDir> <suffix> <query...>")
    val (sfDir, out, suffix, names) =
      (args(0), args(1), args(2), args.drop(3).toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, s"$name$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explainone] wrote $name$suffix")
    }
    spark.stop()
  }
}
