package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact distinct-count via a word-chunked bitmap — the bitmap-index
  * structure (Roaring's dense case) as a mergeable typed Aggregator,
  * behind sk8_bitmap_distinct.
  *
  * Why not `countDistinct`: Catalyst plans it as Expand + a DISTINCT
  * exchange — every (group, value) pair crosses the wire before the
  * final count. At 100 TB with a billion-cardinality id column that
  * exchange IS the job. The bitmap keeps one bit per observed id in
  * the partial buffer, so a map task ships at most one 64-bit word per
  * 64-id-wide populated chunk (dense id spaces compress 64×, and TPC
  * keys ARE dense); the merge is pure word-wise OR — commutative,
  * associative, idempotent — and the finish is a popcount sum. Exact
  * at every cardinality, unlike HLL/KMV, so the count itself
  * hash-gates against the oracle's COUNT(DISTINCT).
  *
  * Buffer: Map(wordIndex = id >>> 6  →  64-bit word with bit id & 63).
  * Any Long id works (negatives land in their own high key range);
  * sparse id spaces degrade gracefully to ~1 word per id — still no
  * worse than the distinct exchange they'd otherwise pay.
  */
object BitmapDistinctAggregator {

  /** Product buffer so partial state stays in Tungsten rows, not kryo. */
  final case class Buf(words: Map[Long, Long])

  final case object BitmapDistinct extends Aggregator[Long, Buf, Long] {

    override def zero: Buf = Buf(Map.empty)

    override def reduce(b: Buf, id: Long): Buf = {
      val key  = id >>> 6
      val mask = 1L << (id & 63L)
      val cur  = b.words.getOrElse(key, 0L)
      if ((cur & mask) != 0L) b // already set — fast path
      else Buf(b.words.updated(key, cur | mask))
    }

    override def merge(a: Buf, b: Buf): Buf = {
      // OR the smaller map into the larger one
      val (big, small) =
        if (a.words.size >= b.words.size) (a.words, b.words) else (b.words, a.words)
      Buf(small.foldLeft(big) { case (acc, (k, w)) =>
        val cur = acc.getOrElse(k, 0L)
        if ((cur | w) == cur) acc else acc.updated(k, cur | w)
      })
    }

    override def finish(b: Buf): Long =
      b.words.valuesIterator.map(java.lang.Long.bitCount(_).toLong).sum

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
