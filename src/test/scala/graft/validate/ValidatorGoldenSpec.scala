package graft.validate

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import graft.SparkSpec

/** Golden cases ported literal-for-literal from the reference suites.
  * Batch 2: `/root/reference/test/price_zone/test_data_validator.py` —
  * the mixed-row attribution matrix (:279-356), opco-column
  * self-validation (:681-780), the semantic date-field check
  * (:663-679), and the IntegerType range variant (:338-356). Batch 3:
  * the complete 19-case date-format regex oracle from
  * `test_date_format_regex.py:20-265`.
  */
class ValidatorGoldenSpec extends SparkSpec {

  private val stringSchema = StructType(Seq(
    StructField("opco_id", StringType, true), StructField("customer_id", StringType, true),
    StructField("supc", StringType, true), StructField("price_zone", StringType, true),
    StructField("effective_date", StringType, true)))

  private def strDf(rows: Seq[Seq[String]]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.map(Row.fromSeq), 2), stringSchema)

  private def failed(df: DataFrame, rules: Seq[ValidationRule]): Seq[String] = {
    val f = Validator.flagged(df, rules)
    Validator.failedGroups(f, rules, "opco_id")
      .collect().map(r => Option(r.getString(0))).toSeq
      .sortBy(k => (k.isDefined, k.getOrElse(""))).map(_.orNull)
  }

  test("PRCP-2016: one empty customer_id among valid rows → ['019']") {
    val rows = Seq(
      Seq("019", "", "4119061", "5", "2020-08-06 00:00:00.000000"),
      Seq("019", "810622", "9002908", "1", "2020-08-06 00:00:00.000000"),
      Seq("019", "666867", "3555349", "1", "2020-08-06 00:00:00.000000"),
      Seq("019", "752266", "4518403", "5", "2020-08-06 00:00:00.000000"))
    assert(failed(strDf(rows), Seq(Rules.nonNullNumeric("customer_id"))) === Seq("019"))
  }

  test("PRCP-2017: supc '1#$%^&' among valid rows → ['019']") {
    val rows = Seq(
      Seq("019", "810622", "9002908", "1", "2020-08-06 00:00:00.000000"),
      Seq("019", "666867", "3555349", "1", "2020-08-06 00:00:00.000000"),
      Seq("019", "480111", "1#$%^&", "5", "2020-08-06 00:00:00.000000"),
      Seq("019", "752266", "4518403", "5", "2020-08-06 00:00:00.000000"))
    assert(failed(strDf(rows), Seq(Rules.nonNullNumeric("supc"))) === Seq("019"))
  }

  test("PRCP-2018: null price_zone among valid rows → ['019']") {
    val rows = Seq(
      Seq("019", "480111", "4119061", null, "2020-08-06 00:00:00.000000"),
      Seq("019", "810622", "9002908", "1", "2020-08-06 00:00:00.000000"),
      Seq("019", "666867", "3555349", "1", "2020-08-06 00:00:00.000000"),
      Seq("019", "752266", "4518403", "5", "2020-08-06 00:00:00.000000"))
    assert(failed(strDf(rows), Seq(Rules.nonNullNumeric("price_zone"))) === Seq("019"))
  }

  test("range check on IntegerType column (test :338-356): 11 out of [1,5] → ['019']") {
    val schema = StructType(stringSchema.fields.updated(3,
      StructField("price_zone", IntegerType, true)))
    val rows = Seq(
      Row("019", "480111", "4119061", Integer.valueOf(1), "2020-08-06 00:00:00.000000"),
      Row("019", "810622", "9002908", Integer.valueOf(11), "2020-08-06 00:00:00.000000"),
      Row("019", "666867", "3555349", Integer.valueOf(1), "2020-08-06 00:00:00.000000"),
      Row("019", "752266", "4518403", Integer.valueOf(5), "2020-08-06 00:00:00.000000"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    assert(failed(df, Seq(Rules.intRange("price_zone", 1, 5))) === Seq("019"))
  }

  test("validate_date_time_field on derived effective_date (test :663-679): valid parses clean") {
    val df = strDf(Seq(Seq("019", "810622", "9002908", "1", "2020-08-06 00:00:00")))
      .withColumnRenamed("effective_date", "eff_from_dttm")
    assert(failed(df, Seq(Rules.parseableTimestamp("eff_from_dttm"))) === Seq.empty)
  }

  test("opco self-validation: null / empty / non-numeric / wrong-length keys attribute themselves (:681-760)") {
    val active = Seq("019", "020")
    val r = Seq(Rules.memberOf("opco_id", active))
    assert(failed(strDf(Seq(Seq(null, "104612", "1234567", "5", "x"))), r) === Seq(null))
    assert(failed(strDf(Seq(Seq("", "104612", "", "5", "x"))), r) === Seq(""))
    assert(failed(strDf(Seq(Seq("abc", "104612", "1234567", "5", "x"))), r) === Seq("abc"))
    assert(failed(strDf(Seq(Seq("0190", "104612", "1234567", "5", "x"))), r) === Seq("0190"))
    assert(failed(strDf(Seq(Seq("19", "104612", "1234567", "5", "x"))), r) === Seq("19"))
  }

  test("mixed invalid opcos '' and '0109' among valid (:761-780) → ['', '0109']") {
    val rows = Seq(
      Seq("", "123456", "4119061", "5", "2020-08-06 00:00:00.000000"),
      Seq("019", "118106", "9002908", "1", "2020-08-06 00:00:00.000000"),
      Seq("019", "196668", "3555349", "1", "2020-08-06 00:00:00.000000"),
      Seq("0109", "687522", "4518403", "5", "2020-08-06 00:00:00.000000"))
    val got = failed(strDf(rows), Seq(Rules.memberOf("opco_id", Seq("019", "020"))))
    assert(got === Seq("", "0109"))
  }

  // Third batch: the complete date-format regex oracle suite, all 19
  // cases literal-for-literal from
  // `/root/reference/test/price_zone/test_date_format_regex.py:20-265`,
  // driven through the REAL rule (which runs the DateFormatMatches byte
  // kernel) and the reference's opco-attribution contract.
  test("date-format regex oracle: both valid formats pass (:20-44)") {
    Seq(("022", "2020-08-06 00:00:00.000000"),
        ("011", "2020-08-06 00:00:00")).foreach { case (opco, dt) =>
      val df = strDf(Seq(Seq(opco, "104612", "1234567", "5", dt)))
        .withColumnRenamed("effective_date", "eff_from_dttm")
      assert(failed(df, Seq(Rules.dateFormat("eff_from_dttm"))) === Seq.empty, dt)
    }
  }

  test("date-format regex oracle: all 17 invalid formats attribute ['011'] (:46-265)") {
    val invalid = Seq(
      "2020-08-06 00:00:00.",    // bare dot, no fraction digits
      "2020-08-06 00:00:00.ddd", // non-digit fraction
      "2020-08-06 00:00",        // missing seconds
      "2020-08-06",              // date only
      "2020/08/06 00:00:00",     // wrong separators
      "2020-08-0600:00:00",      // missing space
      "20200806 00:00:00",       // undelimited date
      "2020-08-06 00 00 00",     // spaces for colons
      "2020-8-06 00:00:00",      // 1-digit month
      "2020-08-6 00:00:00",      // 1-digit day
      "2020-13-06 00:00:00",     // month 13
      "2020-08-32 00:00:00",     // day 32
      "202-08-06 00:00:00",      // 3-digit year
      "202-08-06 00:00:00",      // (duplicated in the reference suite)
      "2020-08-32 25:00:00",     // hour 25
      "2020-08-32 08:66:00",     // minute 66
      "2020-08-32 08:00:90")     // second 90
    invalid.foreach { dt =>
      val df = strDf(Seq(Seq("011", "104612", "1234567", "5", dt)))
        .withColumnRenamed("effective_date", "eff_from_dttm")
      assert(failed(df, Seq(Rules.dateFormat("eff_from_dttm"))) === Seq("011"), dt)
    }
  }
}
