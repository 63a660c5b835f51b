package graft.joins

import graft.SparkSpec
import graft.operators.Interval
import graft.plans.IntervalJoinExec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the native point-in-interval join ([[graft.plans.IntervalJoin]]):
  * inclusive-bound semantics (admit, evict, drop-expired-at-admit, point
  * intervals) against a hand fixture, self-join attribute hygiene, the
  * exactly-two-exchanges plan shape, and parity with the composed
  * equi-join + BETWEEN residual on a randomized fixture.
  */
class IntervalJoinSpec extends SparkSpec {

  /** Run `body` with the physical strategy pinned to the sort-merge
    * exec (threshold ≤ 0 disables the broadcast path — tiny spec
    * fixtures would otherwise always plan BroadcastIntervalJoinExec). */
  private def withSortMerge[T](body: => T): T = {
    spark.conf.set("spark.graft.intervalJoin.broadcastThreshold", "-1")
    try body
    finally spark.conf.unset("spark.graft.intervalJoin.broadcastThreshold")
  }

  private def pointsDf: DataFrame = {
    val ss = spark; import ss.implicits._
    Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 15L, "c"),
      (2L, 7L, "d"), (3L, 1L, "e"))
      .toDF("k", "t", "tag").repartition(3)
  }

  private def intervalsDf: DataFrame = {
    val ss = spark; import ss.implicits._
    Seq((1L, 1L, 10L, 101L),  // spans two points
      (1L, 5L, 5L, 102L),     // zero-length: matches t=5 only
      (1L, 6L, 20L, 103L),    // open when the key ends
      (1L, 12L, 13L, 104L),   // already expired when admitted (t=15)
      (2L, 8L, 9L, 105L),     // key present, no point inside
      (4L, 0L, 100L, 106L))   // key absent on the left
      .toDF("k", "lo", "hi", "rid").repartition(2)
  }

  test("inclusive point-in-interval semantics on the hand fixture") {
    val got = Interval.join(pointsDf, intervalsDf, Seq("k"), "t", "lo", "hi")
      .select(col("k"), col("t"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 5L, 101L), (1L, 5L, 102L),   // both bounds inclusive; point interval
      (1L, 10L, 101L), (1L, 10L, 103L), // 102 evicted (hi 5 < 10)
      (1L, 15L, 103L)))                 // 104 expired before admission
  }

  test("plan: one IntervalJoinExec, exactly two exchanges (the equi-join lower bound)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try withSortMerge {
      val plan = Interval.join(pointsDf, intervalsDf, Seq("k"), "t", "lo", "hi")
        .queryExecution.executedPlan
      val nodes = plan.collect { case e: IntervalJoinExec => e }
      assert(nodes.size == 1, plan.toString)
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.shuffleOrigin ==
              org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS => e
      }
      assert(exchanges.size == 2, plan.toString)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("self-join on one scan keeps attributes unambiguous") {
    val ss = spark; import ss.implicits._
    val events = Seq((1L, 10L, "view"), (1L, 12L, "purchase"),
      (1L, 30L, "purchase"), (2L, 3L, "view"), (2L, 2L, "purchase"))
      .toDF("u", "t", "typ")
    val views = events.filter($"typ" === "view").select($"u", $"t")
    val windows = events.filter($"typ" === "purchase")
      .select($"u", ($"t" - 5L).as("lo"), $"t".as("hi"))
    val got = Interval.join(views, windows, Seq("u"), "t", "lo", "hi")
      .select($"u", $"t", $"hi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // view (1,10) in [7,12]; view (2,3) not in [-3,2]; (1,30) window empty
    assert(got === Set((1L, 10L, 12L)))
  }

  test("filters push below the interval join on BOTH sides (inner-join commute)") {
    val joined = Interval.join(pointsDf, intervalsDf, Seq("k"), "t", "lo", "hi")
    val plan = withSortMerge {
      joined.filter(col("tag") =!= "q").filter(col("rid") > 0L)
        .queryExecution.sparkPlan
    }
    val node = plan.collect { case e: graft.plans.IntervalJoinExec => e }.head
    def filtersIn(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.collect { case f: org.apache.spark.sql.execution.FilterExec =>
        f.condition.sql }
    assert(filtersIn(node.left).exists(_.contains("tag")), plan.toString)
    assert(filtersIn(node.right).exists(_.contains("rid")), plan.toString)
    // and the result equals filtering the inputs directly
    val direct = Interval.join(
      pointsDf.filter(col("tag") =!= "q"),
      intervalsDf.filter(col("rid") > 0L), Seq("k"), "t", "lo", "hi")
    assert(joined.filter(col("tag") =!= "q").filter(col("rid") > 0L)
      .collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq) ===
      direct.collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq))
  }

  test("narrow projections prune both parquet scans through the interval node") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("tsu", graft.streaming.Streaming.tsMicros(col("ts")))
    val points = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("tsu"), col("props"))
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), (col("tsu") - 100L).as("lo"), col("tsu").as("hi"),
        col("value"), col("props").as("p2"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      Interval.join(points, windows, Seq("user_id"), "tsu", "lo", "hi")
        .select(col("user_id"), col("event_id"), col("value"))
        .queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    assert(scans.size == 2)
    scans.foreach { s =>
      assert(!s.schema.fieldNames.contains("props"),
        s"scan reads ${s.schema.fieldNames.mkString(",")}")
    }
  }

  test("randomized parity with the composed equi-join + BETWEEN residual") {
    val ss = spark; import ss.implicits._
    def mix(i: Long, salt: Long): Long =
      ((i * 2654435761L + salt) % 4294967296L).abs
    val points = (0L until 400L)
      .map(i => (mix(i, 17) % 20, mix(i, 31) % 1000, i)).toDF("k", "t", "lid")
      .repartition(5)
    val intervals = (0L until 300L)
      .map { i =>
        val lo = mix(i, 13) % 1000
        (mix(i, 7) % 20, lo, lo + mix(i, 43) % 60, i)
      }.toDF("k", "lo", "hi", "rid").repartition(4)
    val native = Interval.join(points, intervals, Seq("k"), "t", "lo", "hi")
      .select($"lid", $"rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val composed = points.join(
        intervals.withColumnRenamed("k", "k2"),
        $"k" === $"k2" && $"t" >= $"lo" && $"t" <= $"hi")
      .select($"lid", $"rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // (lid, rid) pairs are unique by construction: set equality plus
    // size equality pins multiplicity too
    assert(native.size === composed.size)
    assert(native.toSet === composed.toSet)
    assert(native.nonEmpty) // the fixture must actually exercise matches
  }

  test("null keys and null bounds never match (SQL inner-join parity)") {
    val ss = spark; import ss.implicits._
    // nulls in every role: left key, left time, right key, lo, hi —
    // plus live rows proving the non-null pairs still join
    val points = Seq(
      (Some(1L), Some(5L), 1L), (None, Some(5L), 2L),
      (Some(1L), None, 3L), (Some(2L), Some(7L), 4L))
      .toDF("k", "t", "lid").repartition(2)
    val intervals = Seq(
      (Some(1L), Some(1L), Some(10L), 11L), (None, Some(1L), Some(10L), 12L),
      (Some(1L), None, Some(10L), 13L), (Some(1L), Some(1L), None, 14L),
      (Some(2L), Some(6L), Some(8L), 15L))
      .toDF("k", "lo", "hi", "rid").repartition(2)
    val native = Interval.join(points, intervals, Seq("k"), "t", "lo", "hi")
      .select($"lid", $"rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val composed = points.join(
        intervals.withColumnRenamed("k", "k2"),
        $"k" === $"k2" && $"t" >= $"lo" && $"t" <= $"hi")
      .select($"lid", $"rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(native.size === composed.size)
    assert(native.toSet === composed.toSet)
    assert(native.toSet === Set((1L, 11L), (4L, 15L)))
  }
}
