package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Column pruning through [[AsOfJoin]]. Catalyst's ColumnPruning only
  * descends through nodes it knows, so a narrow projection above the
  * custom node would otherwise leave BOTH child scans reading every
  * column — the scan-width regression the plan suite hunts (ReadSchema
  * must match what the query uses).
  *
  * The rule inserts a Project under each child keeping only the
  * attributes the parent projection references plus the join's own keys
  * and time columns; Catalyst's ColumnPruning then carries that Project
  * down to the scan. The AsOfJoin's output shrinks accordingly — sound
  * because its output is defined positionally from child outputs and
  * the parent Project references survive by construction. Idempotent:
  * once children emit exactly the needed set, the rule no-ops.
  */
object AsOfJoinColumnPruning extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(list, j: AsOfJoin) =>
      val needed = AttributeSet(list.flatMap(_.references)) ++
        AttributeSet(j.leftKeys.flatMap(_.references)) ++
        AttributeSet(j.rightKeys.flatMap(_.references)) ++
        j.leftTime.references ++ j.rightTime.references
      val newLeft =
        if (j.left.output.forall(needed.contains)) j.left
        else Project(j.left.output.filter(needed.contains), j.left)
      val newRight =
        if (j.right.output.forall(needed.contains)) j.right
        else Project(j.right.output.filter(needed.contains), j.right)
      if ((newLeft eq j.left) && (newRight eq j.right)) p
      else Project(list, j.copy(left = newLeft, right = newRight))
  }
}
