package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import graft.SparkSpec

/** Pins q31_bucketed_join's whole point: the join of the two bucketed
  * tables plans as a SortMergeJoin with ZERO shuffle exchange anywhere
  * below it — the shuffle was paid once at bucketed-write time. Without
  * this pin a silent regression (bucket-count mismatch, a projection
  * that drops the bucket spec, `spark.sql.sources.bucketing.enabled`
  * flipped) would leave the gate correct but re-shuffling both sides —
  * the exact cost bucketing exists to remove at 100 TB.
  */
class BucketedJoinGateSpec extends SparkSpec {

  test("q31 joins the bucketed tables with a shuffle-free SortMergeJoin") {
    val df = RelationalQueries.queries("q31_bucketed_join")(spark, "/root/testdata/sf0.001")
    // pre-AQE physical plan: AdaptiveSparkPlanExec wraps its input as a
    // field (not a child), so collect() over executedPlan sees nothing
    // until the query runs; the structural claim is about planning
    val plan = df.queryExecution.sparkPlan
    val smjs = plan.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"no SortMergeJoin in plan:\n${plan.toString.take(3000)}")
    // no exchange below the join: both bucketed scans already satisfy
    // the join's required distribution (the final groupBy above the
    // join still shuffles on its own key — that one is expected)
    val shufflesUnderJoin = smjs.flatMap(_.collect { case e: ShuffleExchangeLike => e })
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join re-shuffled:\n${plan.toString.take(3000)}")
    assert(df.collect().length === 5) // five order priorities
  }
}
