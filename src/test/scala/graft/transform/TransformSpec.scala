package graft.transform

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.SparkSpec

/** End-to-end pipeline specs — the layer the reference never tested
  * (SURVEY.md §5): run the whole transform on a fixture file, assert
  * partition layout + contents + report.
  */
class TransformSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("price zone end-to-end: csv → validate → partitioned csv + report") {
    val in = tmpDir("pz_in")
    val out = tmpDir("pz_out")
    val csv =
      """co_nbr,supc,prc_zone,cust_nbr,eff_from_dttm
        |019,1234567,5,104612,2020-08-06 00:00:00.000000
        |019,7654321,4,104613,2020-08-06 00:00:00
        |020,1234567,9,104612,2020-08-06 00:00:00
        |021,1234567,5,104612,2020-08-06 00:00:00
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(in, "input.csv"), csv)

    val report = PriceZoneTransform.runFile(spark, s"$in/input.csv", out, Seq("019", "020"))

    // opco 020 fails range(9), opco 021 fails membership → only 019 remains
    assert(report.received === 4 && report.valid === 2)
    assert(report.failedGroupKeys === Seq("020", "021"))

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === Array("opco_id=019"))

    val back = spark.read.option("header", "true").csv(s"$out/opco_id=019")
    assert(back.count() === 2)
    assert(back.columns.toSeq === Seq("supc", "price_zone", "customer_id", "effective_date"))
    val dates = back.select("effective_date").collect().map(_.getString(0)).toSet
    assert(dates === Set("2020-08-06 00:00:00")) // fraction stripped, seconds precision
  }

  test("price zone: zero valid records throws (transform_spark_job.py:94-95)") {
    val schema = StructType(Seq(
      StructField("opco_id", StringType, true), StructField("customer_id", StringType, true),
      StructField("supc", StringType, true), StructField("price_zone", StringType, true),
      StructField("eff_from_dttm", StringType, true)))
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("099", "x", "1", "5", "2020-08-06 00:00:00"))), schema)
    assertThrows[IllegalStateException] {
      PriceZoneTransform.run(bad, Seq("019"))
    }
  }

  test("pa transform: renames, date parse, epoch, composite key split, column order") {
    val in = tmpDir("pa_in")
    val csv =
      """ITEM_ID|LOCAL_REFERENCE_PRICE|CURRENT_PRICE|REASON|NEW_PRICE|ITEM_ATTR_5_NM|EFFECTIVE_DATE|EXPORT_DATE|PRICE_ZONE_ID
        |9002908|22.68|1|r|2|N|2020-08-06 00:00:00|2020-08-05 12:30:45|018-5
        |9002909|-1.5|1|r|2|Y|2020-08-07 10:00:00|2020-08-05 12:30:45|019-3
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(in, "pa.csv"), csv)

    val df = PaTransform.transform(graft.sources.CsvSources.pipe(spark, s"$in/pa.csv"))
    assert(df.columns.toSeq === Seq("supc", "effective_date", "price", "export_date",
      "catch_weight_indicator", "price_zone_id", "opco_id"))
    val rows = df.orderBy("supc").collect()
    assert(rows(0).getString(0) === "9002908")
    assert(rows(0).getString(1) === "2020-08-06")            // date part only (X7)
    assert(rows(0).getString(2) === "22.68")                 // price kept as string dtype (S3)
    assert(rows(0).getLong(3) === 1596630645L)               // 2020-08-05 12:30:45 UTC (X8)
    assert(rows(0).getString(5) === "5" && rows(0).getString(6) === "018") // X9 split

    assert(PaTransform.invalidPriceCount(df) === 1L)         // F10: -1.5
  }

  test("pa end-to-end: pipe csv → route → per-cluster partitioned csv + counts") {
    import scala.jdk.CollectionConverters._
    val in = tmpDir("pa_e2e_in")
    val outBase = tmpDir("pa_e2e_out")
    val csv =
      """ITEM_ID|LOCAL_REFERENCE_PRICE|CURRENT_PRICE|REASON|NEW_PRICE|ITEM_ATTR_5_NM|EFFECTIVE_DATE|EXPORT_DATE|PRICE_ZONE_ID
        |9002908|22.68|1|r|2|N|2020-08-06 00:00:00|2020-08-05 12:30:45|018-5
        |9002909|-1.5|1|r|2|Y|2020-08-07 10:00:00|2020-08-05 12:30:45|019-3
        |9002910|10.00|1|r|2|N|2020-08-07 10:00:00|2020-08-05 12:30:45|022-2
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(in, "pa.csv"), csv)
    val mapping = spark.createDataFrame(
      Seq(Row("018", "01"), Row("019", "02")).asJava,
      StructType(Seq(StructField("opco_id", StringType, true), StructField("cluster_id", StringType, true))))

    val (total, badPrice) = PaTransform.runFile(
      spark, s"$in/pa.csv", cid => s"$outBase/cluster_$cid",
      mapping, activeOpcos = Seq("018", "019"))

    assert(total === 3 && badPrice === 1)
    val c1 = new java.io.File(s"$outBase/cluster_01").listFiles().filter(_.isDirectory).map(_.getName)
    assert(c1.toSeq === Seq("opco_id=018"))
    val back = spark.read.option("header", "true").csv(s"$outBase/cluster_01/opco_id=018")
    // fixed column order minus the elided partition column (P6/S5)
    assert(back.columns.toSeq ===
      Seq("supc", "effective_date", "price", "export_date", "catch_weight_indicator", "price_zone_id"))
    assert(back.count() === 1)
  }

  test("pa routing: cluster split + invalid-or-inactive bucket (J1)") {
    import scala.jdk.CollectionConverters._
    val mapping = spark.createDataFrame(
      Seq(Row("018", "01"), Row("019", "02"), Row("022", "03")).asJava,
      StructType(Seq(StructField("opco_id", StringType, true), StructField("cluster_id", StringType, true))))
    val data = spark.createDataFrame(
      Seq(Row("a", "018"), Row("b", "019"), Row("c", "020"), Row("d", "022"), Row("e", "019")).asJava,
      StructType(Seq(StructField("supc", StringType, true), StructField("opco_id", StringType, true))))

    val routed = PaTransform.route(data, mapping, activeOpcos = Seq("018", "019", "020"))
    assert(routed.byCluster("01").select("supc").collect().map(_.getString(0)).sorted.toSeq === Seq("a"))
    assert(routed.byCluster("02").select("supc").collect().map(_.getString(0)).sorted.toSeq === Seq("b", "e"))
    // 020 unmapped, 022 mapped to unknown cluster → both invalid
    assert(routed.invalidOrInactive.collect().map(_.getString(0)).sorted.toSeq === Seq("020", "022"))
  }
}
