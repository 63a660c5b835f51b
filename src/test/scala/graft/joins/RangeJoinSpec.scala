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
}
