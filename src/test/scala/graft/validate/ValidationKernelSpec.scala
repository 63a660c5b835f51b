package graft.validate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column => bridged, expression => exprOf}
import graft.SparkSpec
import graft.functions.expressions.{DateFormatMatches, HasNonDigit, ParseableTimestamp}

/** Pins the byte-walk validation kernels to the exact accept sets of the
  * expressions they replace — Java regex (incl. `$`-before-final-
  * newline and the unescaped `.` wildcard) and Spark's CORRECTED-mode
  * timestamp parser — over adversarial + random inputs evaluated by
  * Spark itself.
  */
class ValidationKernelSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial: Seq[String] = Seq(
    "", "0", "123", "12a", "a12", "abc", "NaN", " 123", "123 ", "١٢٣",
    "2020-08-06 00:00:00", "2020-08-06 23:59:59", "9999-12-31 23:59:59",
    "0000-01-01 00:00:00", "0001-01-01 00:00:00",
    "2020-02-29 00:00:00", "2000-02-29 00:00:00", "2100-02-29 00:00:00",
    "1900-02-29 00:00:00", "2019-02-29 00:00:00", "2020-02-30 10:00:00",
    "2020-04-31 00:00:00", "2020-00-10 00:00:00", "2020-13-01 00:00:00",
    "2020-01-00 00:00:00", "2020-01-32 00:00:00", "2020-01-31 24:00:00",
    "2020-01-31 23:60:00", "2020-01-31 23:59:60", "2020/08/06 00:00:00",
    "2020-8-06 00:00:00", "2020-08-6 00:00:00", "20-08-06 00:00:00",
    " 2020-08-06 00:00:00", "2020-08-06 00:00:00 ", "2020-08-06  00:00:00",
    "2020-08-06T00:00:00", "2020-08-06 00:00", "2020-08-06",
    "2020-08-06 00:00:00.123456", "2020-08-06 00:00:00.1",
    "2020-08-06 00:00:00.", "2020-08-06 00:00:00.abc",
    "2020-08-06 00:00:00.1a", "2020-08-06 00:00:00.1.2",
    "2020-08-06 00:00:0012", "2020-08-06 00:00:001", "2020-08-06 00:00:00x1",
    "2020-08-06 00:00:00é1", "2020-08-06 00:00:00é", "2020-08-06 00:00:00€12",
    "2020-08-06 00:00:00\n", "2020-08-06 00:00:00\r\n", "2020-08-06 00:00:00\r",
    "2020-08-06 00:00:00\n\n", "2020-08-06 00:00:00\n1", "\n2020-08-06 00:00:00",
    "2020-08-06 00:00:00", "2020-08-06 00:00:00 ",
    "2020-08-06 00:00:00 ", "2020-08-06 00:00:001",
    "2020-08-06 00:00:00.12\n", "2020-08-06 00:00:00.12\r\n",
    "2020-08-06 00:00:00.12 ", "2020-02-30 00:00:00.5",
    ".", "..", ".123", "2020-08-06 00:00:00.123456789012345678901234567890")

  private val rnd = new scala.util.Random(7)
  private val random: Seq[String] = (1 to 3000).map { _ =>
    val y = rnd.nextInt(10000); val m = rnd.nextInt(15); val d = rnd.nextInt(35)
    val h = rnd.nextInt(30); val mi = rnd.nextInt(70); val s = rnd.nextInt(70)
    val base = f"$y%04d-$m%02d-$d%02d $h%02d:$mi%02d:$s%02d"
    rnd.nextInt(6) match {
      case 0 => base
      case 1 => base + "." + "1" * (1 + rnd.nextInt(4))
      case 2 => base + rnd.nextPrintableChar() + rnd.nextInt(100)
      case 3 => base.updated(rnd.nextInt(base.length), rnd.nextPrintableChar())
      case 4 => rnd.nextLong().toString
      case _ => rnd.alphanumeric.take(rnd.nextInt(25)).mkString
    }
  }

  private def df = (adversarial ++ random).toDF("s")

  test("HasNonDigit == rlike('[^0-9]')") {
    df.select($"s", bridged(HasNonDigit(exprOf($"s"))).as("k"),
        $"s".rlike("[^0-9]").as("r"))
      .collect().foreach { r =>
        assert(r.getBoolean(1) === r.getBoolean(2), s"input <${r.getString(0)}>")
      }
  }

  test("DateFormatMatches == rlike(DateFormatRegex)") {
    df.select($"s", bridged(DateFormatMatches(exprOf($"s"))).as("k"),
        $"s".rlike(Rules.DateFormatRegex).as("r"))
      .collect().foreach { r =>
        assert(r.getBoolean(1) === r.getBoolean(2), s"input <${r.getString(0)}>")
      }
  }

  test("ParseableTimestamp == try_to_timestamp(substring_index(., 1)).isNotNull") {
    df.select($"s", bridged(ParseableTimestamp(exprOf($"s"))).as("k"),
        try_to_timestamp(substring_index($"s", ".", 1),
          lit(Rules.InputTimestampFormat)).isNotNull.as("r"))
      .collect().foreach { r =>
        assert(r.getBoolean(1) === r.getBoolean(2), s"input <${r.getString(0)}>")
      }
  }

  test("ParseableTimestamp: signed / wide years match Spark's strict 'yyyy' (probed truth)") {
    // Spark accepts: unsigned exactly-4-digit years; '+' only with >4
    // digits (SignStyle.EXCEEDS_PAD); '-' with 4+ digits; <= 9 year
    // digits. These literals are compared LIVE against try_to_timestamp.
    val comparable = Seq(
      "12020-01-01 00:00:00", "+12020-01-01 00:00:00", "-12020-01-01 00:00:00",
      "+2020-01-01 00:00:00", "-2020-01-01 00:00:00", "+0001-01-01 00:00:00",
      "02020-01-01 00:00:00", "+99999-01-01 00:00:00", "+9999999999-01-01 00:00:00",
      "+12345678901234567890-01-01 00:00:00", "+12020-02-29 00:00:00",
      "+12021-02-29 00:00:00", "-0001-01-01 00:00:00", "-99999-01-01 00:00:00")
    comparable.toDF("s")
      .select($"s", bridged(ParseableTimestamp(exprOf($"s"))).as("k"),
        try_to_timestamp(substring_index($"s", ".", 1),
          lit(Rules.InputTimestampFormat)).isNotNull.as("r"))
      .collect().foreach { r =>
        assert(r.getBoolean(1) === r.getBoolean(2), s"input <${r.getString(0)}>")
      }
    // 6-9 digit years are beyond the timestamp's micros range: the
    // ORIGINAL expression THROWS (uncaught ArithmeticException from the
    // instant->micros conversion — verified by probe); the kernel
    // deliberately flags invalid instead of crashing the query.
    val overflowing = Seq("+999999-01-01 00:00:00", "+999999999-01-01 00:00:00",
      "-999999-01-01 00:00:00")
    overflowing.toDF("s")
      .select(bridged(ParseableTimestamp(exprOf($"s"))).as("k"))
      .collect().foreach(r => assert(!r.getBoolean(0)))
    intercept[Exception] {
      Seq("+999999-01-01 00:00:00").toDF("s")
        .select(try_to_timestamp(substring_index($"s", ".", 1),
          lit(Rules.InputTimestampFormat)).isNotNull.as("r")).collect()
    }
  }

  test("kernels stay inside whole-stage codegen") {
    // spark.range, not a local Seq: ConvertToLocalRelation folds a
    // projection over a LocalRelation away entirely, leaving no codegen
    // stage to assert on
    val plan = spark.range(10)
      .select(concat(lit("2020-08-06 00:00:0"), $"id").as("s"))
      .select(
      bridged(HasNonDigit(exprOf($"s"))).as("a"),
      bridged(DateFormatMatches(exprOf($"s"))).as("b"),
      bridged(ParseableTimestamp(exprOf($"s"))).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("has_non_digit") && l.trim.startsWith("*(")), plan)
  }
}
