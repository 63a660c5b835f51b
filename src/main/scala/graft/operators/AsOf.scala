package graft.operators

import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.Project
import graft.plans.{AsOfJoin, AsOfJoinStrategy}

/** Public entry for the native backward as-of join (see
  * [[graft.plans.AsOfJoin]] for the operator design). Resolves columns
  * by name against the analyzed children, re-aliases the right side
  * with fresh expression ids (the two sides usually scan the same
  * table, and a bypassed analyzer never runs Join's dedupRight), and
  * self-registers the planner strategy on the session so the operator
  * works on ANY SparkSession — no `spark.sql.extensions` config
  * required.
  */
object AsOf {

  /** Backward as-of join: every `left` row gains the `right` row with
    * the greatest `rightTime` ≤ `leftTime` for equal `keys`, or nulls.
    * Right columns keep their names; callers project/rename as usual.
    */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    // fresh ids so self-as-of (same scan on both sides) stays unambiguous
    val rPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(out: Seq[Attribute], name: String, side: String): Attribute =
      out.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"as-of $side column '$name' not in [${out.map(_.name).mkString(", ")}]"))
    val rOut = rPlan.output
    GraftPlanBridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      keys.map(attr(lPlan.output, _, "left key")),
      keys.map(attr(rOut, _, "right key")),
      attr(lPlan.output, leftTime, "left time"),
      attr(rOut, rightTime, "right time")))
  }
}
