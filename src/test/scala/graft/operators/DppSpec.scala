package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import graft.SparkSpec

/** Pins that q30_dpp_star actually triggers DYNAMIC partition pruning:
  * the month-partitioned fact scan must carry a dynamic-pruning
  * expression in its PartitionFilters (the dim-side quarter filter
  * arriving through the broadcast at runtime), and the final executed
  * scan must read only the 3 matching month partitions of 80. Without
  * this pin, a silent conf or plan regression would leave the gate
  * correct but reading the whole fact table — precisely the 100 TB
  * failure mode DPP exists to prevent.
  */
class DppSpec extends SparkSpec {

  test("fact scan carries a dynamic-pruning partition filter") {
    val df = RelationalQueries.q30(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.sparkPlan
    val factScans = plan.collect {
      case s: FileSourceScanExec if s.metadata.get("Location").exists(_.contains("graft_q30_dpp")) => s
    }
    assert(factScans.nonEmpty, "no fact scan found in plan")
    assert(factScans.exists(_.partitionFilters.exists(
        _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))),
      s"no dynamic-pruning partition filter on the fact scan:\n${plan.toString.take(4000)}")
  }

  test("executed scan reads only the pruned partitions") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = (p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }) ++ p.subqueries.flatMap(allScans)
    val df = RelationalQueries.q30(spark, "/root/testdata/sf0.001")
    val rows = df.collect() // forces execution so runtime metrics exist
    assert(rows.length === 3) // 1996 Q2 = three months
    val factScans = allScans(df.queryExecution.executedPlan).filter(
      _.metadata.get("Location").exists(_.contains("graft_q30_dpp")))
    assert(factScans.nonEmpty, "no fact scan found in executed plan")
    val read = factScans.map(s =>
      s.metrics.get("numPartitions").map(_.value).getOrElse(-1L)).max
    assert(read === 3L, s"fact scan read $read partitions, expected 3 of 80")
  }
}
