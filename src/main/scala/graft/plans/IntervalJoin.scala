package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, BinaryNode => LogicalBinaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Native keyed point-in-interval join — the second whole-operator
  * extension (the as-of join's sibling): for every left row (key, t),
  * emit one joined row per right row (key, lo, hi) with the same key
  * and lo ≤ t ≤ hi (both bounds inclusive — the BETWEEN convention).
  *
  * Why an operator instead of a composed plan: Spark plans the
  * `l.key = r.key AND t BETWEEN lo AND hi` join as a SortMergeJoin on
  * the key with the range residual as a post-join FILTER — every
  * (point, interval) pair of a key materializes through the join
  * buffer before the filter drops it, so a key with p points and r
  * intervals costs p·r regardless of how few actually overlap. The
  * binned-equi-key rewrite ([[graft.joins.RangeJoin.pointInRange]])
  * fixes that but pays an explode of interval-length/binWidth
  * duplicate rows through the exchange and needs a width tuned to the
  * interval distribution. This operator is the IEJoin-family
  * sort-merge sweep: both sides hash-cluster on the key (the equi-join
  * lower bound — EXACTLY two exchanges) and sort in-partition by
  * (key, t) / (key, lo); the per-partition merge keeps an ACTIVE SET
  * of open intervals — admitted when lo ≤ t, evicted when hi < t —
  * so the cost is O(n + m + matches) with state bounded by the maximum
  * concurrent interval overlap of one key, never p·r and never an
  * explode factor.
  */
case class IntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightLo: Expression,
    rightHi: Expression) extends LogicalBinaryNode {
  // right KEY columns are excluded: this is an inner join, they always
  // equal the left keys (the `USING` convention, same as AsOfJoin)
  override def output: Seq[Attribute] =
    left.output ++ right.output
      .filterNot(a => rightKeys.exists(_.semanticEquals(a)))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoin]] as [[IntervalJoinExec]]; injected via
  * `spark.experimental.extraStrategies` (self-registered by
  * [[graft.operators.Interval]]) and `GraftExtensions`. */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, lk, rk, lt, lo, hi) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, lt, lo, hi) :: Nil
    case _ => Nil
  }
}

/** Sort-merge point-in-interval join (see [[IntervalJoin]] for the
  * operator design). Children arrive hash-clustered on the key and
  * sorted by (key, time) / (key, lo) via `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements plans the minimal
  * exchanges exactly as for SortMergeJoin. The per-partition sweep:
  * as left times ascend within a key, right rows with lo ≤ t are
  * admitted to the active set once (each right row is consumed from
  * the buffered iterator exactly once) and rows with hi < t are
  * evicted permanently — correct because t never decreases within the
  * key, so an expired interval can never match a later point. */
case class IntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightLo: Expression,
    rightHi: Expression) extends BinaryExecNode {

  require(Seq(leftTime.dataType, rightLo.dataType, rightHi.dataType).forall(t =>
    t == LongType || t == TimestampNTZType || t.isInstanceOf[TimestampType]),
    s"interval-join bound columns must be LONG or TIMESTAMP (micros-backed), " +
      s"got ${leftTime.dataType.sql} / ${rightLo.dataType.sql} / " +
      s"${rightHi.dataType.sql}")

  override def output: Seq[Attribute] =
    left.output ++ right.output
      .filterNot(a => rightKeys.exists(_.semanticEquals(a)))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightLo).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  // rows emit grouped per left row, so the left's (key, time) order
  // survives the join
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val lo = rightLo; val hi = rightHi
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rLoProj = UnsafeProjection.create(Seq(lo), rOut)
      val rHiProj = UnsafeProjection.create(Seq(hi), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // open intervals of the CURRENT key: (row copy, hi); bounded by
      // the key's maximum concurrent overlap, the operator's one buffer
      val active = new ArrayBuffer[(InternalRow, Long)]
      var activeKey: UnsafeRow = null
      // SQL inner-join null semantics: a NULL key or NULL bound makes
      // `l.key = r.key AND t BETWEEN lo AND hi` UNKNOWN, never a match —
      // but the sweep's natural ordering groups null keys together and
      // UnsafeRow.getLong reads a null field as 0, so null rows must be
      // dropped EXPLICITLY on both sides (left: skipped; right: consumed
      // off the buffered iterator — null keys/los sort first within
      // their run, so consumption preserves the merge order).
      lIter.flatMap { l =>
        val lKey = lKeyProj(l)
        val lTimeRow = lTimeProj(l)
        if (lKey.anyNull || lTimeRow.isNullAt(0)) Iterator.empty
        else {
          val lTm = lTimeRow.getLong(0)
          if (activeKey == null || keyOrd.compare(activeKey, lKey) != 0) {
            active.clear()
            activeKey = lKey.copy()
          }
          var scanning = true
          while (scanning && rBuf.hasNext) {
            val head = rBuf.head
            if (rKeyProj(head).anyNull) rBuf.next() // null key: no match ever
            else {
              val cmp = keyOrd.compare(rKeyProj(head), lKey)
              if (cmp < 0) rBuf.next() // right key behind every remaining left
              else if (cmp > 0) scanning = false
              else {
                val loRow = rLoProj(head)
                if (loRow.isNullAt(0)) rBuf.next() // null lo: no match ever
                else if (loRow.getLong(0) <= lTm) {
                  val r = rBuf.next().copy()
                  val hiRow = rHiProj(r)
                  // a null hi never matches; an interval already closed
                  // before this point can never match a later one either
                  // (times ascend) — drop, not admit
                  if (!hiRow.isNullAt(0) && hiRow.getLong(0) >= lTm)
                    active += ((r, hiRow.getLong(0)))
                } else scanning = false
              }
            }
          }
          active.filterInPlace(_._2 >= lTm)
          active.iterator.map { case (r, _) => outProj(joined(l, r)) }
        }
      }
    }
  }
}
