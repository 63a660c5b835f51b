package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, Expression, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.optimizer.{ColumnPruning, ConstantFolding}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Runtime Bloom-filter injection for the NATIVE join nodes — the
  * missing half of Spark's own `InjectRuntimeFilter`, which pattern-
  * matches `Join` and therefore never sees [[AsOfJoin]] or
  * [[IntervalJoin]]. At cluster scale the sort-merge paths of both
  * operators pay their dominant cost in the two key exchanges; when one
  * side's key set is small and selective, shuffling the other side's
  * non-matching rows is pure waste. This rule plants the standard
  * remedy: a Bloom filter built from the small ("creation") side's keys
  * in a scalar subquery, applied as a semi-join-ish `might_contain`
  * Filter on the large ("application") side BELOW the join, so pruning
  * happens before that side's exchange and sort.
  *
  * Soundness per operator:
  *  - [[AsOfJoin]] emits every LEFT row (left-outer semantics), so only
  *    the RIGHT side is prunable — a right row whose key never occurs
  *    on the left can never be any left row's match, at any direction
  *    or tolerance. Creation side is therefore always the left.
  *  - [[IntervalJoin]] is inner, so either side is prunable; the rule
  *    prefers pruning the right by the left's keys and falls back to
  *    the reverse when the sizes say so.
  *  Bloom false positives only ADMIT rows the join itself re-checks, so
  *  results are bit-identical with the rule on or off.
  *
  * Firing conditions (mirroring `InjectRuntimeFilter`'s size gates):
  * creation side ≤ `spark.graft.runtimeFilter.creationSideThreshold`
  * (default 100 MB — an extra aggregate pass over more is not worth
  * it), application side ≥
  * `spark.graft.runtimeFilter.applicationSideThreshold` (default 1 GB
  * — below that the exchange being pruned is already cheap; Spark's
  * scan-size gate is 10 GB, ours is lower because the savings land in
  * a shuffle+sort, not just a scan), and the application side must not
  * be about to BROADCAST (a side under the operators' broadcast
  * threshold never shuffles, so there is nothing to prune — and the
  * creation side must itself exceed that threshold only in the
  * prune-left case, where a broadcastable right already avoids the
  * exchange entirely). Kill switch:
  * `spark.graft.runtimeFilter.enabled=false`.
  *
  * Both key lists hash through one `xxhash64(k1, k2, …)` (seed 42 on
  * both sides), so composite keys filter on the FULL key, not a single
  * column. The subquery's aggregate is column-pruned and
  * constant-folded here — it is born after the optimizer's own
  * `OptimizeSubqueries` pass, so nothing downstream would do it.
  * Idempotent (a subtree already carrying a `might_contain` on the
  * same hashed keys is left alone), which the fixed-point batches both
  * injection paths run in require.
  */
object NativeJoinRuntimeFilter extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.runtimeFilter.enabled", "true").toBoolean
  private def creationMax: Long =
    conf.getConfString("spark.graft.runtimeFilter.creationSideThreshold",
      (100L << 20).toString).toLong
  private def applicationMin: Long =
    conf.getConfString("spark.graft.runtimeFilter.applicationSideThreshold",
      (1L << 30).toString).toLong
  private def broadcastThreshold(key: String): Long =
    conf.getConfString(key, "") match {
      case "" => conf.autoBroadcastJoinThreshold
      case s => s.toLong
    }

  private def hasBloom(plan: LogicalPlan, appKeys: Seq[Expression]): Boolean =
    plan.exists {
      case Filter(cond, _) => cond.exists {
        case BloomFilterMightContain(_, h: XxHash64) =>
          h.children.length == appKeys.length &&
            h.children.zip(appKeys).forall { case (a, b) => a.semanticEquals(b) }
        case _ => false
      }
      case _ => false
    }

  /** The pruned application side, or None when the gates say no. */
  private def inject(appPlan: LogicalPlan, appKeys: Seq[Expression],
      creationPlan: LogicalPlan, creationKeys: Seq[Expression]): Option[LogicalPlan] = {
    if (appKeys.isEmpty || hasBloom(appPlan, appKeys)) return None
    if (creationPlan.stats.sizeInBytes > creationMax) return None
    if (appPlan.stats.sizeInBytes < applicationMin) return None
    val rowCount = creationPlan.stats.rowCount
    val bloomAgg =
      if (rowCount.exists(_.longValue > 0L))
        new BloomFilterAggregate(new XxHash64(creationKeys), rowCount.get.longValue)
      else new BloomFilterAggregate(new XxHash64(creationKeys))
    val alias = Alias(bloomAgg.toAggregateExpression(), "graftBloomFilter")()
    // prune+fold NOW: this subquery is created after OptimizeSubqueries
    // already ran, so the creation plan would otherwise carry every
    // column through the aggregate
    val agg = ConstantFolding(ColumnPruning(
      Aggregate(Nil, Seq(alias), creationPlan)))
    Some(Filter(
      BloomFilterMightContain(ScalarSubquery(agg), new XxHash64(appKeys)),
      appPlan))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ AsOfJoin(l, r, lk, rk, _, _, _, _)
          if r.stats.sizeInBytes >
            broadcastThreshold("spark.graft.asOfJoin.broadcastThreshold") =>
        inject(r, rk, l, lk).map(f => j.copy(right = f)).getOrElse(j)
      case j @ IntervalJoin(l, r, lk, rk, _, _, _)
          if r.stats.sizeInBytes >
              broadcastThreshold("spark.graft.intervalJoin.broadcastThreshold") &&
            // one bloom per join: without this, the fixed-point batch's
            // next pass would see the pruned right, fail inject() there,
            // and fall through to stacking the REVERSE direction too
            !hasBloom(r, rk) && !hasBloom(l, lk) =>
        inject(r, rk, l, lk).map(f => j.copy(right = f))
          .orElse(inject(l, lk, r, rk).map(f => j.copy(left = f)))
          .getOrElse(j)
    }
  }
}
