package graft.joins

import graft.SparkSpec
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Pins [[graft.plans.AsOfJoin]]'s statistics override: the node is
  * row-preserving (exactly one output row per left row), so its size
  * estimate is the SUM of its inputs, not the stats visitor's default
  * PRODUCT — the difference decides whether a parent join above an
  * as-of result can ever broadcast-plan it.
  */
class AsOfJoinStatsSpec extends SparkSpec {

  test("as-of output estimates sum-of-inputs and a parent join can " +
      "broadcast it") {
    val ss = spark; import ss.implicits._
    val left = Seq((1L, 100L), (2L, 150L), (3L, 90L))
      .toDF("k", "t")
    val right = Seq((1L, 50L, 10.0), (2L, 120L, 20.0))
      .toDF("k", "rt", "v")
    val asof = AsOf.joinBackward(left, right, Seq("k"), "t", "rt")
    val node = asof.queryExecution.optimizedPlan.collectFirst {
      case a: graft.plans.AsOfJoin => a
    }.getOrElse(fail("no AsOfJoin node in the optimized plan"))
    val (l, r) = (node.left.stats.sizeInBytes, node.right.stats.sizeInBytes)
    assert(node.stats.sizeInBytes == l + r,
      s"expected sum $l + $r, got ${node.stats.sizeInBytes}")
    assert(node.maxRows == node.left.maxRows)

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
}
