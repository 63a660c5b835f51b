package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `classic.Dataset.ofRows`, `private[sql]` in Spark 4 — the
  * supported pattern for libraries that define custom logical operators
  * (here [[graft.plans.AsOfJoin]]) and hand them back as `DataFrame`s.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
