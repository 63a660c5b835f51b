package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit pins for [[graft.functions.expressions.SortedIntersectCount]] —
  * the d16 verify kernel. Inputs are duplicate-free ascending long
  * arrays (the shape the per-doc `array_sort` over the distinct-shingle
  * kernel produces); the merge must count exactly |A∩B|. */
class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  private def inter(a: Seq[Long], b: Seq[Long]): Long = {
    import org.apache.spark.sql.GraftColumnBridge
    val df = Seq((a, b)).toDF("a", "b")
    df.select(GraftColumnBridge.column(
      graft.functions.expressions.SortedIntersectCount(
        GraftColumnBridge.expression(col("a")),
        GraftColumnBridge.expression(col("b")))).as("n"))
      .head().getLong(0)
  }

  test("disjoint, empty, identical, partial overlaps") {
    assert(inter(Seq(1L, 5L, 9L), Seq(2L, 6L, 10L)) == 0L)
    assert(inter(Seq.empty, Seq(1L, 2L)) == 0L)
    assert(inter(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 3L)
    assert(inter(Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 7L, 8L)) == 2L)
    assert(inter(Seq(Long.MinValue, 0L, Long.MaxValue),
      Seq(Long.MinValue, Long.MaxValue)) == 2L)
  }

  test("asymmetric lengths — one side exhausts first") {
    assert(inter(Seq(5L), Seq(1L, 2L, 3L, 4L, 5L, 6L)) == 1L)
    assert(inter(Seq(1L, 2L, 3L, 4L, 5L, 6L), Seq(6L)) == 1L)
  }

  test("matches size(array_intersect) on random sorted distinct sets") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val a = rnd.shuffle((0L to 200L).toVector).take(rnd.nextInt(30))
        .distinct.sorted
      val b = rnd.shuffle((0L to 200L).toVector).take(rnd.nextInt(30))
        .distinct.sorted
      assert(inter(a, b) == a.toSet.intersect(b.toSet).size.toLong)
    }
  }
}
