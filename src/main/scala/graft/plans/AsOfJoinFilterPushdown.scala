package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Pushes left-side predicates through [[AsOfJoin]]. Catalyst's own
  * PushPredicateThroughJoin only knows Join nodes, so without this rule
  * a `WHERE` above an as-of join stalls there and the scan under the
  * left side loses its PushedFilters — the exact pruning regression the
  * plan suite exists to catch.
  *
  * Soundness: every AsOfJoin output row corresponds 1:1 to a left input
  * row (left rows are never duplicated or dropped — the operator is a
  * left outer enrichment), so a predicate over left attributes commutes
  * with the join. Right-side predicates do NOT commute (dropping a
  * right row can change which candidate an UNFILTERED left row matches
  * — for that, filter `right` before calling the API) and are left
  * in place. Only deterministic conjuncts move, mirroring Catalyst's
  * own pushdown guard; the rule is idempotent because after one pass
  * the remaining conjuncts reference right-side attributes.
  */
object AsOfJoinFilterPushdown extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val (pushable, kept) = conjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
