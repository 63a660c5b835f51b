package graft.joins

import graft.SparkSpec
import graft.operators.AsOf
import graft.plans.AsOfJoinExec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the native as-of join ([[graft.plans.AsOfJoin]]): semantics
  * against a local reference, self-as-of attribute hygiene, the
  * exactly-two-exchanges plan shape, and parity with the composed
  * union+window formulation on a randomized fixture.
  */
class AsOfJoinSpec extends SparkSpec {

  /** Pin the physical strategy to the sort-merge exec (threshold ≤ 0
    * disables the broadcast path — tiny spec fixtures would otherwise
    * always plan BroadcastAsOfJoinExec). */
  private def withSortMerge[T](body: => T): T = {
    spark.conf.set("spark.graft.asOfJoin.broadcastThreshold", "-1")
    try body
    finally spark.conf.unset("spark.graft.asOfJoin.broadcastThreshold")
  }

  private def leftDf: DataFrame = {
    val ss = spark; import ss.implicits._
    Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 4L, "z"),
      (2L, 5L, "c"), (3L, 7L, "d"))
      .toDF("k", "t", "tag").repartition(3)
  }

  private def rightDf: DataFrame = {
    val ss = spark; import ss.implicits._
    Seq((1L, 5L, 100.0), (1L, 15L, 200.0), (1L, 20L, 250.0),
      (2L, 6L, 300.0), (4L, 1L, 400.0))
      .toDF("k", "rt", "v").repartition(2)
  }

  test("backward as-of semantics: greatest right time <= left time, else null") {
    val got = AsOf.joinBackward(leftDf, rightDf, Seq("k"), "t", "rt")
      .orderBy("k", "t")
      .select(col("k"), col("t"),
        coalesce(col("v"), lit(-1.0)).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      (1L, 4L, -1.0),    // nothing at or before t=4
      (1L, 10L, 100.0),  // rt=5
      (1L, 20L, 250.0),  // rt=20 ties left time: <= matches
      (2L, 5L, -1.0),    // right exists only at rt=6 > 5
      (3L, 7L, -1.0)))   // key absent on the right
  }

  test("plan: one AsOfJoinExec, exactly two exchanges (the equi-join lower bound)") {
    // AQE off for the assertion: executedPlan then exposes the
    // EnsureRequirements output directly (collect can't descend into
    // AdaptiveSparkPlanExec, and sparkPlan predates the exchanges).
    // Only ENSURE_REQUIREMENTS exchanges count — the fixture's explicit
    // repartitions are test noise.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try withSortMerge {
      val plan = AsOf.joinBackward(leftDf, rightDf, Seq("k"), "t", "rt")
        .queryExecution.executedPlan
      val asofs = plan.collect { case e: AsOfJoinExec => e }
      assert(asofs.size == 1, plan.toString)
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.shuffleOrigin ==
              org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS => e
      }
      assert(exchanges.size == 2, plan.toString)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("self-as-of on one scan keeps attributes unambiguous") {
    val ss = spark; import ss.implicits._
    val events = Seq((1L, 10L, "click"), (1L, 8L, "buy"), (1L, 12L, "buy"),
      (2L, 3L, "click"), (2L, 1L, "buy"))
      .toDF("u", "t", "typ")
    val clicks = events.filter($"typ" === "click").select($"u", $"t")
    val buys = events.filter($"typ" === "buy")
      .select($"u".as("u2"), $"t".as("bt")).withColumnRenamed("u2", "u")
    val got = AsOf.joinBackward(clicks, buys, Seq("u"), "t", "bt")
      .orderBy("u").select("u", "t", "bt")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq((1L, 10L, 8L), (2L, 3L, 1L)))
  }

  test("forward direction: smallest right time >= left time") {
    val got = AsOf.joinForward(leftDf, rightDf, Seq("k"), "t", "rt")
      .orderBy("k", "t")
      .select(col("k"), col("t"), coalesce(col("v"), lit(-1.0)).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      (1L, 4L, 100.0),   // rt=5 is the first at-or-after
      (1L, 10L, 200.0),  // rt=15
      (1L, 20L, 250.0),  // rt=20 ties: >= matches
      (2L, 5L, 300.0),   // rt=6
      (3L, 7L, -1.0)))   // key absent on the right
  }

  test("tolerance bounds the match gap in both directions") {
    val back = AsOf.joinBackward(leftDf, rightDf, Seq("k"), "t", "rt",
        toleranceMicros = Some(5L))
      .orderBy("k", "t")
      .select(coalesce(col("v"), lit(-1.0)))
      .collect().map(_.getDouble(0)).toSeq
    // (1,10)->rt5 gap 5 ok; (1,20)->rt20 gap 0 ok; (1,4) none
    assert(back == Seq(-1.0, 100.0, 250.0, -1.0, -1.0))
    val fwd = AsOf.joinForward(leftDf, rightDf, Seq("k"), "t", "rt",
        toleranceMicros = Some(1L))
      .orderBy("k", "t")
      .select(coalesce(col("v"), lit(-1.0)))
      .collect().map(_.getDouble(0)).toSeq
    // (1,4)->rt5 gap 1 ok; (1,10)->rt15 gap 5 drop; (1,20)->rt20 ok;
    // (2,5)->rt6 gap 1 ok
    assert(fwd == Seq(100.0, -1.0, 250.0, 300.0, -1.0))
  }

  test("left-side filters push below the as-of join; right-side stay above") {
    val joined = AsOf.joinBackward(leftDf, rightDf, Seq("k"), "t", "rt")
    // left-only predicate (tag): must land under AsOfJoinExec's left
    // child; right-only predicate (v): must NOT move (it would change
    // which candidate an unfiltered left row matches)
    val plan = withSortMerge {
      joined.filter(col("tag") =!= "q").filter(col("v") > 0.0)
        .queryExecution.sparkPlan
    }
    val asof = plan.collect { case e: AsOfJoinExec => e }.head
    def filtersIn(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.collect { case f: org.apache.spark.sql.execution.FilterExec =>
        f.condition.sql }
    assert(filtersIn(asof.left).exists(_.contains("tag")), plan.toString)
    assert(!filtersIn(asof.left).exists(_.contains("v")), plan.toString)
    assert(!filtersIn(asof.right).exists(_.contains("tag")), plan.toString)
    // and the result is unchanged vs filtering the inputs directly
    val direct = AsOf.joinBackward(
      leftDf.filter(col("tag") =!= "q"), rightDf, Seq("k"), "t", "rt")
      .filter(col("v") > 0.0)
    assert(joined.filter(col("tag") =!= "q").filter(col("v") > 0.0)
      .collect().toSet == direct.collect().toSet)
  }

  test("narrow projections prune both parquet scans through the as-of node") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val clicks = ev.filter(col("event_type") === "click")
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("rts"), col("value").as("pv"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      val narrow = AsOf.joinBackward(clicks, buys, Seq("user_id"), "ts", "rts")
        .select(col("user_id"), col("pv"))
      narrow.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    assert(scans.size == 2)
    // neither scan may read the wide unused columns (props, event_id)
    scans.foreach { s =>
      val read = s.schema.fieldNames.toSet
      assert(!read.contains("props") && !read.contains("event_id"),
        s"scan reads ${read.mkString(",")}")
    }
  }

  test("randomized parity with the composed union+window as-of") {
    val ss = spark; import ss.implicits._
    // deterministic pseudo-random fixture: 400 left / 300 right rows
    // over 20 keys, times in [0, 1000) — hash-mixed, no RNG
    def mix(i: Long, salt: Long): Long =
      ((i * 2654435761L + salt) % 4294967296L).abs
    val left = (0L until 400L)
      .map(i => (mix(i, 17) % 20, mix(i, 31) % 1000, i)).toDF("k", "t", "lid")
      .repartition(5)
    // unique (k, rt) on the right so the match is well-defined
    val right = (0L until 300L)
      .map(i => (mix(i, 7) % 20, mix(i, 13) % 1000, i))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("k", "rt", "rid").repartition(4)
    val native = AsOf.joinBackward(left, right, Seq("k"), "t", "rt")
      .select($"lid", coalesce($"rid", lit(-1L)).as("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // composed form: union with a tag, per-key window carrying the last
    // right id at or before each row
    import org.apache.spark.sql.expressions.Window
    val tagged = left.select($"k", $"t", $"lid", lit(null: java.lang.Long).as("rid"))
      .unionByName(right.select($"k", $"rt".as("t"),
        lit(null: java.lang.Long).as("lid"), $"rid"))
    val w = Window.partitionBy($"k")
      .orderBy($"t", $"rid".asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = tagged
      .withColumn("last_rid", last($"rid", ignoreNulls = true).over(w))
      .filter($"lid".isNotNull)
      .select($"lid", coalesce($"last_rid", lit(-1L)).as("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(native.size == 400 && native == composed)
  }

  test("null keys and null times never match; null-keyed left rows null-extend") {
    val ss = spark; import ss.implicits._
    // nulls in every role; live rows prove non-null pairs still match
    val left = Seq(
      (Some(1L), Some(10L), 1L), (None, Some(10L), 2L),
      (Some(1L), None, 3L), (Some(2L), Some(9L), 4L))
      .toDF("k", "t", "lid").repartition(2)
    val right = Seq(
      (Some(1L), Some(5L), 11L), (None, Some(5L), 12L),
      (Some(1L), None, 13L), (Some(2L), Some(6L), 14L))
      .toDF("k", "rt", "rid").repartition(2)
    val got = AsOf.joinBackward(left, right, Seq("k"), "t", "rt")
      .select($"lid", coalesce($"rid", lit(-1L)).as("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the SQL-equivalent argmax left join: null key/time -> no match,
    // left row kept with nulls (lid 2 and 3); null right rows (12, 13)
    // are never candidates
    assert(got === Map(1L -> 11L, 2L -> -1L, 3L -> -1L, 4L -> 14L))
    // forward direction shares the skip logic
    val fwd = AsOf.joinForward(left, right, Seq("k"), "t", "rt")
      .select($"lid", coalesce($"rid", lit(-1L)).as("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fwd === Map(1L -> -1L, 2L -> -1L, 3L -> -1L, 4L -> -1L))
  }
}
