package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator —
  * the mergeable bottom-k DISTINCT hash set behind sk7_kmv.
  *
  * Why not `distinct().orderBy(h).limit(k)`: that plan shuffles the
  * FULL distinct hash set before the limit — at 100 TB the distinct
  * exchange is the whole cost. This aggregator keeps the k smallest
  * distinct hashes in the partial buffer, so each map task ships at
  * most k longs (k=256 → 2 KB) no matter how many rows it scanned;
  * the merge is the classic KMV set union + re-truncate. One corpus
  * pass, no distinct exchange, driver sees k values.
  *
  * Estimator (consumed by the gate, not computed here):
  * distinct ≈ (k−1)·2^32 / h_k with h_k = the k-th smallest distinct
  * hash over a 2^32 hash universe.
  *
  * Per-row cost: one compare against the current k-th value rejects
  * almost every row once the buffer warms (the accept probability
  * decays as k/seen); the O(k) dedup + insert runs only on accepts.
  */
object KmvAggregator {

  /** Product buffer so partial state stays in Tungsten rows, not kryo.
    * `items` is ascending, distinct, size ≤ k. */
  final case class Buf(items: List[Long])

  final case class Kmv(k: Int) extends Aggregator[Long, Buf, Seq[Long]] {

    private def insert(buf: List[Long], v: Long): List[Long] =
      if (buf.size >= k && v >= buf.last) buf // 1-compare fast path
      else if (buf.contains(v)) buf           // set semantics (KMV, not top-k)
      else ((v :: buf).sorted).take(k)

    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, v: Long): Buf = Buf(insert(b.items, v))
    override def merge(a: Buf, b: Buf): Buf = Buf(b.items.foldLeft(a.items)(insert))
    override def finish(b: Buf): Seq[Long] = b.items
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
