package graft.joins

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the naive BETWEEN join exactly") {
    val points = Seq.tabulate(200)(i => (i.toLong, i * 3.7 - 100.0)).toDF("pid", "v")
    val ranges = Seq.tabulate(40)(j => (j.toLong, j * 17.0 - 120.0, j * 17.0 - 120.0 + 42.0))
      .toDF("rid", "lo", "hi")
    val got = RangeJoin.pointInRange(points, ranges, "v", "lo", "hi", binWidth = 42.0)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    val want = points.join(ranges, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
  }

  test("intervals spanning many bins and inverted intervals") {
    val points = Seq((1L, 5.0), (2L, 95.0), (3L, 250.0)).toDF("pid", "v")
    val ranges = Seq(
      (10L, 0.0, 100.0),   // spans 11 bins at width 10
      (11L, 90.0, 10.0)    // inverted: joins nothing
    ).toDF("rid", "lo", "hi")
    val got = RangeJoin.pointInRange(points, ranges, "v", "lo", "hi", binWidth = 10.0)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L)))
  }

  test("plans a hash join on the bin key, not a nested-loop join") {
    val points = Seq((1L, 5.0)).toDF("pid", "v")
    val ranges = Seq((10L, 0.0, 9.0)).toDF("rid", "lo", "hi")
    val plan = RangeJoin.pointInRange(points, ranges, "v", "lo", "hi", binWidth = 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashJoin"), plan)
  }

  test("intervalOverlap: owner-bin rule emits each overlapping pair EXACTLY once") {
    // intervals chosen so many pairs share several bins at width 10 —
    // without the owner filter the bin join would duplicate those pairs
    val a = Seq(
      (1L, 0L, 35L),    // spans bins 0..3
      (2L, 18L, 22L),   // spans bins 1..2
      (3L, 40L, 40L),   // zero-length
      (4L, 100L, 130L)) // disjoint from b except b4
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq(
      (10L, 5L, 28L),   // spans bins 0..2: overlaps a1 (shares 3 bins), a2 (2 bins)
      (11L, 30L, 45L),  // overlaps a1, a3
      (12L, 40L, 40L),  // zero-length touching a3 exactly
      (13L, 129L, 200L))// overlaps a4 at the tail
      .toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 10L)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    val want = a.join(b, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    // SEQUENCE equality after sort — multiplicity matters (a distinct
    // would mask duplicate emissions, the thing the owner rule prevents)
    assert(got.sorted === want.sorted)
    assert(got.size === got.toSet.size, "duplicate pair emitted")
    // the fixture really exercises multi-bin sharing
    assert(want.contains((1L, 10L)) && want.contains((3L, 12L)) && want.contains((4L, 13L)))
  }
}
