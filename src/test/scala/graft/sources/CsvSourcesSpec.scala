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

  test("pipe csv honors separator and header (S3)") {
    val dir = Files.createTempDirectory("pipesrc")
    val p = Paths.get(dir.toString, "pa.csv")
    Files.writeString(p, "A|B\n1|x\n2|y\n")
    val df = CsvSources.pipe(spark, p.toString)
    assert(df.columns.toSeq === Seq("A", "B"))
    assert(df.count() === 2)
  }
}
