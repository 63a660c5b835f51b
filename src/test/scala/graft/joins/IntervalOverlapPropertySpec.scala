package graft.joins

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property check for the owner-bin interval-overlap join: over
  * deterministic random interval sets (seed 42) and several bin widths
  * — including widths much smaller and much larger than the interval
  * spans — the binned join must equal the naive inequality join as a
  * MULTISET (each overlapping pair exactly once, no pair lost, no pair
  * duplicated). Random inputs deliberately include zero-length
  * intervals, bin-boundary endpoints (multiples of the width), and
  * negative coordinates (floor-division bins).
  */
class IntervalOverlapPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def randomIntervals(n: Int, span: Int): Seq[(Long, Long, Long)] =
    (1 to n).map { i =>
      // negative and boundary-aligned coordinates on purpose
      val lo = rnd.nextInt(400) - 200 match {
        case v if rnd.nextInt(4) == 0 => (v / 10) * 10 // snap some to bin edges
        case v => v
      }
      val len = if (rnd.nextInt(5) == 0) 0 else rnd.nextInt(span)
      (i.toLong, lo.toLong, (lo + len).toLong)
    }

  test("owner-bin join equals the naive join as a multiset, across bin widths") {
    for (width <- Seq(3L, 10L, 25L, 1000L)) {
      val a = randomIntervals(60, 40).toDF("aid", "a_lo", "a_hi")
      val b = randomIntervals(60, 40).toDF("bid", "b_lo", "b_hi")
      val got = RangeJoin
        .intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", width)
        .select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
      val want = a.join(b, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        .select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
      assert(got === want, s"width=$width")
      assert(got.size === got.toSet.size, s"duplicate pair at width=$width")
      assert(want.nonEmpty, s"degenerate fixture at width=$width")
    }
  }
}
