package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator (SURVEY.md §2.8's "optional
  * custom aggregate" slot, filled where it actually pays).
  *
  * The window form of per-group top-k
  * (`row_number().over(partitionBy(g).orderBy(score))` then
  * `rank <= k`) shuffles EVERY candidate row to its group's partition
  * and sorts there. This aggregator keeps a k-bounded, worst-first
  * buffer in the partial aggregate, so the shuffle carries at most k
  * (score, id) pairs per group per map task — at 100 TB the difference
  * between shipping the candidate set and shipping the answer.
  *
  * Ordering: score DESC, id ASC tie-break (identical to the window form
  * used by the gate queries; `TopKAggregatorSpec` asserts equality).
  */
object TopKAggregator {

  /** One scored candidate. */
  final case class Scored(score: Double, id: Long)
  /** Product buffer so partial state stays in Tungsten rows, not kryo. */
  final case class Buf(items: List[Scored])

  final case class TopK(k: Int) extends Aggregator[Scored, Buf, Seq[Scored]] {

    /** "worse" = lower score, then higher id. Buffer is kept worst-first. */
    private def worse(a: Scored, b: Scored): Boolean =
      a.score < b.score || (a.score == b.score && a.id > b.id)

    private def insert(buf: List[Scored], v: Scored): List[Scored] =
      if (buf.size < k) (v :: buf).sortWith(worse)
      else if (worse(v, buf.head)) buf
      else (v :: buf.tail).sortWith(worse)

    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, v: Scored): Buf = Buf(insert(b.items, v))
    override def merge(a: Buf, b: Buf): Buf = Buf(b.items.foldLeft(a.items)(insert))
    override def finish(b: Buf): Seq[Scored] =
      b.items.sortWith((x, y) => worse(y, x)) // best-first
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }
}
