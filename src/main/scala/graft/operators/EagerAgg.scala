package graft.operators

import org.apache.spark.sql.SparkSession

/** Public entry for eager aggregation (see
  * [[graft.plans.AggregatePushThroughJoin]] for the match conditions
  * and the soundness/cost argument). */
object EagerAgg {

  /** Installs the push-aggregate-through-join rule on the session:
    * after this, a GROUP BY over an inner equi-join whose far side is
    * provably unique on the join key — and whose near-side grouping
    * keys ARE the join keys — aggregates BEFORE the join, shrinking
    * the join's input from fact rows to groups. Also installed by
    * `GraftExtensions`; disable per-session with
    * `spark.graft.eagerAggregation=false`. */
  def enable(spark: SparkSession): Unit =
    graft.plans.SessionRegistration.ensureRules(spark,
      Seq(graft.plans.AggregatePushThroughJoin))
}
