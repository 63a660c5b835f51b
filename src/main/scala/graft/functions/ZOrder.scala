package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Morton (z-order) curve values as composed built-ins — the
  * multi-dimensional clustering key lakehouse engines use for data
  * layout: sorting by z-value co-locates rows that are close in BOTH
  * dimensions, so a range predicate on either column prunes contiguous
  * file ranges instead of scattering across the sort order.
  *
  * Built from shift/and/or column expressions only, so the whole
  * computation stays inside whole-stage codegen (no UDF, no boxing);
  * the expression tree is 2·bits nodes — constant-folded per row. The
  * key property (an ALIGNED 4^m-cell z-range is exactly a 2^m × 2^m
  * tile) is pinned by `ZOrderSpec` and exhibited by the x13 gate's
  * per-bucket min/max spans.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two nonnegative ints:
    * result bit (2i+1) = bit i of `a`, bit (2i) = bit i of `b`. */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i))
    }.reduce(_.bitwiseOR(_)).cast(LongType)
  }

  /** The same interleave as engine-portable SQL text (DuckDB and Spark
    * share `>>`, `<<`, `&`, `|` on integers) — used by the x13 oracle. */
  def zValue2Sql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($a >> $i) & 1) << ${2 * i + 1}) | ((($b >> $i) & 1) << ${2 * i}))"
    }.mkString("(", " | ", ")")
}
