package graft.operators

import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.Project
import graft.plans.{AsOfBackward, AsOfDirection, AsOfForward, AsOfJoin, AsOfJoinStrategy}

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

  /** Installs the SQL auto-rewrite on the session: after this, the
    * standard `spark.sql` as-of idiom — inner/left join on
    * `l.k = r.k AND r.t <= l.t` topped by `row_number() = 1` per left
    * row — plans as the native [[graft.plans.AsOfJoin]] with no API
    * change (see [[graft.plans.AsOfJoinAutoRewrite]] for the exact
    * match conditions, including the partition-uniqueness proof).
    * Also installed by `GraftExtensions`; disable per-session with
    * `spark.graft.asOfJoin.autoRewrite=false`. */
  def enableSqlRewrite(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.plans.SessionRegistration.ensure(spark, AsOfJoinStrategy,
      Seq(graft.plans.AsOfJoinAutoRewrite,
        graft.plans.AsOfAggregateRewrite,
        graft.plans.AsOfJoinFilterPushdown,
        graft.plans.AsOfJoinColumnPruning,
        graft.plans.NativeJoinRuntimeFilter))

  /** Backward as-of join: every `left` row gains the `right` row with
    * the greatest `rightTime` ≤ `leftTime` for equal `keys`, or nulls.
    * Right columns keep their names; callers project/rename as usual.
    * `toleranceMicros` bounds the match gap (pandas merge_asof's
    * `tolerance`): matches farther back than the bound become nulls.
    */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      toleranceMicros: Option[Long] = None): DataFrame =
    join(left, right, keys, leftTime, rightTime, AsOfBackward, toleranceMicros)

  /** Forward as-of join: the SMALLEST `rightTime` ≥ `leftTime` per key
    * (pandas merge_asof direction='forward'; DuckDB `ON l.t <= r.t`). */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      toleranceMicros: Option[Long] = None): DataFrame =
    join(left, right, keys, leftTime, rightTime, AsOfForward, toleranceMicros)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, direction: AsOfDirection,
      toleranceMicros: Option[Long]): DataFrame = {
    val spark = left.sparkSession
    graft.plans.SessionRegistration.ensure(spark, AsOfJoinStrategy,
      Seq(graft.plans.AsOfJoinFilterPushdown,
        graft.plans.AsOfJoinColumnPruning,
        graft.plans.NativeJoinRuntimeFilter))
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
      attr(rOut, rightTime, "right time"),
      direction, toleranceMicros))
  }
}
