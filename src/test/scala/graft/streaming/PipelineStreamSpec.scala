package graft.streaming

import java.nio.file.{Files, Paths}
import graft.SparkSpec

class PipelineStreamSpec extends SparkSpec {

  private def write(dir: String, name: String, body: String): Unit =
    Files.writeString(Paths.get(dir, name), body)

  test("arriving csv files stream through validate -> partitioned layout") {
    val in = Files.createTempDirectory("pzs_in").toString
    val out = Files.createTempDirectory("pzs_out").toString
    val ckpt = Files.createTempDirectory("pzs_ckpt").toString

    write(in, "f1.csv",
      """co_nbr,supc,prc_zone,cust_nbr,eff_from_dttm
        |019,1234567,5,104612,2020-08-06 00:00:00
        |020,7654321,9,104613,2020-08-06 00:00:00
        |""".stripMargin)
    write(in, "f2.csv",
      """co_nbr,supc,prc_zone,cust_nbr,eff_from_dttm
        |020,1111111,3,104614,2020-08-07 00:00:00
        |""".stripMargin)

    val reports = PipelineStream.runPriceZoneStream(
      spark, in, out, ckpt, activeOpcos = Seq("019", "020"))

    assert(reports.nonEmpty)
    val total = reports.map(_.report.received).sum
    assert(total === 3)
    // opco 020 poisoned in f1 (zone 9) but batch boundaries matter:
    // f2's 020 row is valid if processed in a separate batch
    // idempotent sink: each batch lands under batch_id=<id>/opco_id=<o>
    val batchDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(batchDirs.nonEmpty && batchDirs.forall(_.getName.startsWith("batch_id=")))
    val opcoDirs = batchDirs.flatMap(_.listFiles()).filter(_.isDirectory).map(_.getName).toSet
    assert(opcoDirs.contains("opco_id=019"))

    // second run with same checkpoint: nothing new to process
    val again = PipelineStream.runPriceZoneStream(
      spark, in, out, ckpt, activeOpcos = Seq("019", "020"))
    assert(again.map(_.report.received).sum === 0)

    // late-arriving file picked up incrementally with exactly-once offsets
    write(in, "f3.csv",
      """co_nbr,supc,prc_zone,cust_nbr,eff_from_dttm
        |019,2222222,2,104615,2020-08-08 00:00:00
        |""".stripMargin)
    val third = PipelineStream.runPriceZoneStream(
      spark, in, out, ckpt, activeOpcos = Seq("019", "020"))
    assert(third.map(_.report.received).sum === 1)
    val back = spark.read.option("header", "true").csv(s"$out/batch_id=*/opco_id=019")
    assert(back.count() >= 2) // f1's 019 row + f3's row
  }
}
