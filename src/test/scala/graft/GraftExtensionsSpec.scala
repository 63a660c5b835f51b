package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions registers float_dot for plain SQL") {
    // extensions only apply at session creation — isolate from any
    // shared suite session (later suites lazily recreate their own)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val d = spark.sql(
        "SELECT float_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
          "array(cast(3.0 as float), cast(4.0 as float))) AS d")
        .head().getDouble(0)
      assert(d === 11.0)
      // registered with documentation
      val desc = spark.sql("DESCRIBE FUNCTION float_dot").collect().map(_.getString(0)).mkString("\n")
      assert(desc.contains("float_dot"))
      val sig = spark.sql(
        "SELECT minhash_sig(split('a b c d', ' '), 3, 8) AS s")
        .head().getSeq[String](0)
      assert(sig.length === 8 && sig.forall(_.length == 4))
      val sh = spark.sql("SELECT simhash_sig(split('a b c', ' ')) AS s").head().getLong(0)
      assert(sh >= 0L)
      assert(spark.sql("SELECT long_dot(array(2L, 3L), array(5L, 7L)) AS d")
        .head().getLong(0) === 31L)
      val ts = spark.sql(
        "SELECT top_shingle_stats(split('a b a b', ' '), 2) AS t").head().getStruct(0)
      assert(ts.getLong(0) === 2L && ts.getLong(1) === 3L)
      val wf = spark.sql(
        "SELECT winnow_fps(split('a b c d e f g h i', ' '), 5, 4) AS w").head().getSeq[String](0)
      assert(wf.nonEmpty && wf.forall(_.length == 32))
      assert(spark.sql("SELECT has_non_digit('12a') AS x").head().getBoolean(0))
      assert(spark.sql("SELECT date_format_matches('2020-08-06 00:00:00') AS x")
        .head().getBoolean(0))
      assert(!spark.sql("SELECT parseable_timestamp('2020-02-30 10:00:00') AS x")
        .head().getBoolean(0))
      assert(spark.sql("SELECT lang_id('the cat and the dog') AS l")
        .head().getString(0) === "en")
      assert(spark.sql("SELECT lang_id(CAST(NULL AS STRING)) AS l")
        .head().getString(0) === "und")
      // cdc_boundaries: positions are in-range window ends; short
      // inputs yield the empty array (not null)
      val cb = spark.sql(
        "SELECT cdc_boundaries('the quick brown fox jumps over the lazy dog', 16) AS b")
        .head().getSeq[Int](0)
      assert(cb.forall(p => p >= 16 && p <= 43))
      assert(spark.sql("SELECT cdc_boundaries('tiny', 16) AS b")
        .head().getSeq[Int](0).isEmpty)

      // LevenshteinGuardRule: the optimized filter carries the
      // length-difference guard, runs once (idempotent under the
      // fixed-point batch), and never changes results
      import spark.implicits._
      // parquet-backed (a LocalRelation would be constant-folded before
      // the filter survives into the optimized plan)
      val lvDir = java.nio.file.Files.createTempDirectory("lev_guard").toString
      Seq(
        ("short", "short"), ("short", "shrt"), ("short", "a much longer string"),
        ("abcdef", "abcxef"), (null: String, "x"), ("y", null: String))
        .toDF("a", "b").write.mode("overwrite").parquet(lvDir)
      val q = spark.read.parquet(lvDir).filter(org.apache.spark.sql.functions
        .levenshtein($"a", $"b") <= 2)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("abs(") && opt.contains("length("),
        s"guard missing from optimized plan:\n$opt")
      assert(opt.sliding("levenshtein".length).count(_ == "levenshtein") <= 2,
        s"rule must not stack guards:\n$opt")
      val got = q.select($"a", $"b").collect().map(r => (r.getString(0), r.getString(1)))
      assert(got.toSet === Set(("short", "short"), ("short", "shrt"), ("abcdef", "abcxef")))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
