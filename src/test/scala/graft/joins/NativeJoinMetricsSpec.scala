package graft.joins

import graft.SparkSpec
import graft.operators.{AsOf, Interval}
import graft.plans.{AsOfJoinExec, BroadcastAsOfJoinExec, BroadcastIntervalJoinExec, IntervalJoinExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQLMetrics contract for the four native-join execs — the
  * operators' UI/observability surface. Values are asserted EXACTLY
  * against hand-counted fixtures: output rows and match counts for
  * both as-of strategies, admissions/evictions for the interval
  * sweep's active set (its bounded-state claim, now engine-reported
  * the way StateOperatorProgress reports streaming state).
  */
class NativeJoinMetricsSpec extends SparkSpec {

  private def leftDf(): DataFrame = {
    val ss = spark; import ss.implicits._
    // key 10: times 5, 10; key 20: time 7; null key; null time
    Seq((1L, Some(10L), Some(5L)), (2L, Some(10L), Some(10L)),
      (3L, Some(20L), Some(7L)), (4L, None, Some(1L)), (5L, Some(10L), None))
      .toDF("lid", "k", "t")
  }

  private def rightDf(): DataFrame = {
    val ss = spark; import ss.implicits._
    // key 10 has rt=4 (matches both left rows), key 30 never probed
    Seq((Some(10L), Some(4L), 100L), (Some(30L), Some(1L), 300L))
      .toDF("k", "rt", "v").repartition(2)
  }

  private def withSortMerge[A](body: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.graft.asOfJoin.broadcastThreshold", "-1")
    spark.conf.set("spark.graft.intervalJoin.broadcastThreshold", "-1")
    try body finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.graft.asOfJoin.broadcastThreshold")
      spark.conf.unset("spark.graft.intervalJoin.broadcastThreshold")
    }
  }

  test("sort-merge as-of reports output rows and match count") {
    withSortMerge {
      val df = AsOf.joinBackward(leftDf(), rightDf(), Seq("k"), "t", "rt")
      df.collect()
      val exec = df.queryExecution.executedPlan
        .collect { case e: AsOfJoinExec => e }.head
      // 5 left rows out (left-outer), 2 matched (lid 1 and 2 via rt=4)
      assert(exec.metrics("numOutputRows").value === 5L)
      assert(exec.metrics("numMatched").value === 2L)
    }
  }

  test("broadcast as-of reports the same counts through the index path") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = AsOf.joinBackward(leftDf(), rightDf(), Seq("k"), "t", "rt")
      df.collect()
      val exec = df.queryExecution.executedPlan
        .collect { case e: BroadcastAsOfJoinExec => e }.head
      assert(exec.metrics("numOutputRows").value === 5L)
      assert(exec.metrics("numMatched").value === 2L)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("interval sweep reports matches, admissions, and evictions") {
    val ss = spark; import ss.implicits._
    val pts = Seq((1L, 10L, 5L), (2L, 10L, 10L), (3L, 10L, 30L))
      .toDF("lid", "k", "t")
    val ivs = Seq((10L, 0L, 12L, 100L), (10L, 8L, 9L, 200L), (10L, 50L, 60L, 300L))
      .toDF("k", "lo", "hi", "v").repartition(2)
    withSortMerge {
      val df = Interval.join(pts, ivs, Seq("k"), "t", "lo", "hi")
      df.collect()
      val exec = df.queryExecution.executedPlan
        .collect { case e: IntervalJoinExec => e }.head
      // t=5 admits [0,12] (match); t=10 admits [8,9] — already closed
      // (hi 9 < 10) so it is DROPPED not admitted, [0,12] still open
      // (match); t=30 evicts [0,12], admits nothing ([50,60] stays
      // unconsumed: lo 50 > 30). Output = 2; admitted = 1; evicted = 1.
      assert(exec.metrics("numOutputRows").value === 2L)
      assert(exec.metrics("numAdmitted").value === 1L)
      assert(exec.metrics("numEvicted").value === 1L)
    }
  }

  test("broadcast interval probe reports output rows") {
    val ss = spark; import ss.implicits._
    val pts = Seq((1L, 10L, 5L), (2L, 10L, 8L), (3L, 20L, 5L))
      .toDF("lid", "k", "t")
    val ivs = Seq((10L, 0L, 6L, 100L), (10L, 7L, 9L, 200L))
      .toDF("k", "lo", "hi", "v")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Interval.join(pts, ivs, Seq("k"), "t", "lo", "hi")
      df.collect()
      val exec = df.queryExecution.executedPlan
        .collect { case e: BroadcastIntervalJoinExec => e }.head
      assert(exec.metrics("numOutputRows").value === 2L)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
