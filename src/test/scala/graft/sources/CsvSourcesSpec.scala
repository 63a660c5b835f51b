package graft.sources

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream
import graft.SparkSpec

/** S1/S2 source coverage: gz CSVs read transparently (the reference's
  * separate decompress job is unnecessary as an operator), and the
  * post-read fan-out for non-splittable inputs.
  */
class CsvSourcesSpec extends SparkSpec {

  test("gz csv reads transparently with all-string schema (S2)") {
    val dir = Files.createTempDirectory("gzsrc")
    val gz = Paths.get(dir.toString, "input.csv.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(gz))
    out.write("co_nbr,supc,prc_zone\n019,123,5\n020,456,4\n".getBytes("UTF-8"))
    out.close()

    val df = CsvSources.commaAllString(spark, gz.toString)
    assert(df.columns.toSeq === Seq("co_nbr", "supc", "prc_zone"))
    assert(df.schema.fields.forall(_.dataType.typeName === "string"))
    assert(df.count() === 2)
    // gz is non-splittable: single input partition
    assert(df.rdd.getNumPartitions === 1)
  }

  test("repartitionAfterRead fans a single-partition source out") {
    val dir = Files.createTempDirectory("gzsrc2")
    val gz = Paths.get(dir.toString, "input.csv.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(gz))
    out.write(("x,y\n" + (1 to 100).map(i => s"$i,${i * 2}").mkString("\n")).getBytes("UTF-8"))
    out.close()
    val df = CsvSources.repartitionAfterRead(CsvSources.commaAllString(spark, gz.toString), 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100)
  }

  test("corrupt-record capture keeps malformed lines instead of failing") {
    val dir = Files.createTempDirectory("corrupt")
    val p = Paths.get(dir.toString, "in.csv")
    Files.writeString(p,
      "co_nbr,supc,prc_zone\n019,123,5\n\"unterminated,quote,5\n020,456,4\n")
    val df = CsvSources.commaWithCorruptCapture(
      spark, p.toString, Seq("co_nbr", "supc", "prc_zone")).cache()
    val bad = df.filter(df("_corrupt_record").isNotNull)
    val good = df.filter(df("_corrupt_record").isNull)
    assert(bad.count() === 1)
    assert(good.count() === 2)
    assert(bad.head().getAs[String]("_corrupt_record").contains("unterminated"))
    df.unpersist()
  }

  test("singleFilePerGroup write yields exactly one csv per partition dir") {
    import spark.implicits._
    val df = Seq(("019", "a"), ("019", "b"), ("020", "c"))
      .toDF("opco_id", "v").repartition(4)
    val out = Files.createTempDirectory("onefile").toString
    graft.sinks.PartitionedCsvSink.write(df, out, Seq("opco_id"), singleFilePerGroup = true)
    Seq("opco_id=019", "opco_id=020").foreach { d =>
      val files = new java.io.File(s"$out/$d").listFiles().filter(_.getName.endsWith(".csv"))
      assert(files.length === 1, d)
    }
  }

  test("pipe csv honors separator and header (S3)") {
    val dir = Files.createTempDirectory("pipesrc")
    val p = Paths.get(dir.toString, "pa.csv")
    Files.writeString(p, "A|B\n1|x\n2|y\n")
    val df = CsvSources.pipe(spark, p.toString)
    assert(df.columns.toSeq === Seq("A", "B"))
    assert(df.count() === 2)
  }
}
