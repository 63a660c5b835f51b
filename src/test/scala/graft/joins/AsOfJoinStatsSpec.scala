package graft.joins

import graft.SparkSpec
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Pins [[graft.plans.AsOfJoin]]'s statistics override: the node is
  * row-preserving (exactly one output row per left row), so its size
  * estimate is left's size SCALED BY THE OUTPUT/LEFT ROW-WIDTH RATIO —
  * not the stats visitor's default PRODUCT (which would forbid ever
  * broadcasting an as-of result), and not sum-of-inputs either (which
  * UNDER-estimates a narrow left carrying a wide right payload on
  * every output row and could wrongly broadcast it; ADVICE r8).
  */
class AsOfJoinStatsSpec extends SparkSpec {

  test("as-of output estimates width-scaled-left and a parent join " +
      "can broadcast it") {
    val ss = spark; import ss.implicits._
    val left = Seq((1L, 100L), (2L, 150L), (3L, 90L))
      .toDF("k", "t")
    val right = Seq((1L, 50L, 10.0), (2L, 120L, 20.0))
      .toDF("k", "rt", "v")
    val asof = AsOf.joinBackward(left, right, Seq("k"), "t", "rt")
    val node = asof.queryExecution.optimizedPlan.collectFirst {
      case a: graft.plans.AsOfJoin => a
    }.getOrElse(fail("no AsOfJoin node in the optimized plan"))
    val leftW = node.left.output.map(_.dataType.defaultSize.toLong).sum
    val outW = node.output.map(_.dataType.defaultSize.toLong).sum
    val want = node.left.stats.sizeInBytes * outW / leftW
    assert(node.stats.sizeInBytes == want,
      s"expected width-scaled $want, got ${node.stats.sizeInBytes}")
    assert(node.maxRows == node.left.maxRows)
    // the estimate must never be below the per-row floor: output rows
    // are at least as wide as left rows
    assert(node.stats.sizeInBytes >= node.left.stats.sizeInBytes)

    // a parent equi-join above the (tiny) as-of result must see a
    // broadcastable size — under the default product estimate it never
    // would once either input crosses ~sqrt(threshold)
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "x")
    val joined = dim.join(asof, Seq("k"))
    val bhj = joined.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty,
      s"no BroadcastHashJoin above the as-of:\n${joined.queryExecution.sparkPlan}")
  }

  test("narrow left × wide right estimates ABOVE sum-of-inputs") {
    // The r8 under-estimate shape: a 2-column left probing a wide
    // right — every output row carries the whole right payload, so the
    // honest size is ~left.rows × outputWidth, strictly more than
    // left.size + right.size when left has many more rows than right.
    val ss = spark; import ss.implicits._
    val left = (1L to 500L).map(i => (i % 5, i)).toDF("k", "t")
    val right = Seq((0L, 1L, "w1" * 40, "w2" * 40, "w3" * 40))
      .toDF("k", "rt", "p1", "p2", "p3")
    val asof = AsOf.joinBackward(left, right, Seq("k"), "t", "rt")
    val node = asof.queryExecution.optimizedPlan.collectFirst {
      case a: graft.plans.AsOfJoin => a
    }.getOrElse(fail("no AsOfJoin node in the optimized plan"))
    val sum = node.left.stats.sizeInBytes + node.right.stats.sizeInBytes
    assert(node.stats.sizeInBytes > sum,
      s"width-scaled estimate ${node.stats.sizeInBytes} should exceed " +
        s"sum-of-inputs $sum for a narrow-left/wide-right as-of")
  }
}
