package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Eliminates a provably-redundant DISTINCT: a grouping-only Aggregate
  * (`SELECT DISTINCT ...` — every output expression is a grouping
  * expression, no aggregate functions) whose grouping tuple contains a
  * key that [[PartitionUniqueness]] proves identifies at most one row
  * of the child collapses to a Project. If some subset of the output is
  * unique PER INPUT ROW, no two input rows can produce equal tuples, so
  * the dedup shuffles the whole relation to remove nothing.
  *
  * Non-redundancy vs vanilla Spark 4.1 (probed empirically, NOTES_r9;
  * the r8 discipline — a third candidate rule was deleted that round
  * after vanilla proved to cover it): Spark's own
  * `RemoveRedundantAggregates` + `LogicalPlanDistinctKeys` propagation
  * already eliminate distincts whose uniqueness flows from Aggregate /
  * Deduplicate children — including through Projects, Windows, and
  * PK-FK joins. What vanilla structurally CANNOT cover is uniqueness
  * this engine knows and Spark does not:
  *
  *   - **custom nodes**: `distinctKeys` of an unknown LogicalPlan is
  *     empty, so a DISTINCT above the native [[AsOfJoin]] always
  *     survives in vanilla — even though the as-of is row-preserving
  *     (exactly one output row per left row) and therefore transports
  *     the left side's uniqueness. This is the synergy case: engines
  *     that add operators must also teach the optimizer their shape,
  *     or every query over them pays a full redundant shuffle;
  *   - `monotonically_increasing_id()` columns (unique by
  *     construction; vanilla keeps the distinct — probed);
  *   - `Range` output (enumerates distinct longs; vanilla keeps the
  *     distinct — probed).
  *
  * Soundness: the rewrite keeps the exact output expressions
  * (`Project(aggregateExpressions, child)`) — only the dedup
  * disappears. Grouping expressions must all be deterministic (a
  * nondeterministic grouping expression under a distinct is
  * ill-defined anyway, and the proof must not reason about values that
  * change between evaluations). Multiset semantics: DISTINCT's output
  * cardinality is the number of distinct tuples; with a per-row-unique
  * key that IS the input cardinality, which Project preserves.
  *
  * At scale the win is one full exchange plus a hash-dedup of the
  * entire relation — on a 100 TB table a DISTINCT that removes nothing
  * is the single most expensive no-op a query can run.
  *
  * Conf-gated by `spark.graft.distinct.eliminate` (default true where
  * installed — via `GraftExtensions` or
  * [[graft.operators.DistinctElim.enable]]).
  */
object DistinctElimination extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.distinct.eliminate", "true")
      .toBoolean

  /** `SELECT DISTINCT` shape: no aggregate function anywhere, and every
    * output expression is (a reference to) a grouping expression. */
  private def isDistinctShape(a: Aggregate): Boolean =
    a.aggregateExpressions.forall(
      _.find(_.isInstanceOf[AggregateExpression]).isEmpty) &&
      a.groupingExpressions.nonEmpty &&
      a.aggregateExpressions.forall { ne =>
        a.groupingExpressions.exists(g =>
          g.semanticEquals(ne) || (ne match {
            case al: org.apache.spark.sql.catalyst.expressions.Alias =>
              g.semanticEquals(al.child)
            case _ => false
          }))
      }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case a: Aggregate
          if isDistinctShape(a) &&
            a.groupingExpressions.forall(_.deterministic) && {
              val keys = AttributeSet(a.groupingExpressions.collect {
                case attr: Attribute => attr
              })
              keys.nonEmpty &&
                PartitionUniqueness.provablyUnique(keys, a.child)
            } =>
        Project(a.aggregateExpressions, a.child)
    }
}
