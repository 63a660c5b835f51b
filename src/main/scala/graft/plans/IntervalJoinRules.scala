package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Pushes predicates through [[IntervalJoin]]. Catalyst's
  * PushPredicateThroughJoin only knows Join nodes, so a `WHERE` above
  * the custom node would stall there and the scans would lose their
  * PushedFilters.
  *
  * Soundness: the interval join is INNER and each output row references
  * exactly one left and one right input row, so a deterministic
  * predicate over either side's attributes commutes with the join —
  * BOTH sides push (stronger than [[AsOfJoinFilterPushdown]], where
  * dropping a right row can change which candidate an unfiltered left
  * row matches). Mixed-side conjuncts stay above. Idempotent: after one
  * pass the remaining conjuncts reference both sides.
  */
object IntervalJoinFilterPushdown extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: IntervalJoin) =>
      val parts = conjuncts(cond)
      val toLeft = parts.filter(c =>
        c.deterministic && c.references.subsetOf(j.left.outputSet))
      val toRight = parts.filter(c =>
        c.deterministic && c.references.subsetOf(j.right.outputSet) &&
          !c.references.subsetOf(j.left.outputSet))
      val kept = parts.filterNot(c => toLeft.contains(c) || toRight.contains(c))
      if (toLeft.isEmpty && toRight.isEmpty) f
      else {
        val pushed = j.copy(
          left = toLeft.reduceOption(And).map(Filter(_, j.left)).getOrElse(j.left),
          right = toRight.reduceOption(And).map(Filter(_, j.right)).getOrElse(j.right))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Column pruning through [[IntervalJoin]] — same contract as
  * [[AsOfJoinColumnPruning]]: insert a Project under each child keeping
  * the parent projection's references plus the join's keys and bound
  * columns, so Catalyst's ColumnPruning can carry the narrow set down
  * to both scans' ReadSchema. Idempotent by the same argument.
  */
object IntervalJoinColumnPruning extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(list, j: IntervalJoin) =>
      val needed = AttributeSet(list.flatMap(_.references)) ++
        AttributeSet(j.leftKeys.flatMap(_.references)) ++
        AttributeSet(j.rightKeys.flatMap(_.references)) ++
        j.leftTime.references ++ j.rightLo.references ++ j.rightHi.references
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
