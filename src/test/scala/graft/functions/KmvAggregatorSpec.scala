package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KmvAggregatorSpec extends SparkSpec {
  import KmvAggregator._

  private val k = 8
  private val agg = Kmv(k)

  private def fold(xs: Seq[Long]): Seq[Long] =
    agg.finish(xs.foldLeft(agg.zero)(agg.reduce))

  test("finish equals distinct-sort-take(k) on any fold order") {
    val xs = Seq(9L, 3L, 9L, 14L, 3L, 1L, 27L, 8L, 2L, 8L, 40L, 5L, 6L, 7L)
    val expect = xs.distinct.sorted.take(k)
    assert(fold(xs) == expect)
    assert(fold(xs.reverse) == expect)
    assert(fold(xs.sorted) == expect)
  }

  test("merge is a set union + re-truncate (associative, commutative)") {
    val a = Seq(5L, 1L, 9L, 120L, 7L).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(2L, 5L, 30L, 4L, 11L, 6L).foldLeft(agg.zero)(agg.reduce)
    val c = Seq(3L, 8L, 1L, 99L).foldLeft(agg.zero)(agg.reduce)
    val all = Seq(5L, 1L, 9L, 120L, 7L, 2L, 5L, 30L, 4L, 11L, 6L, 3L, 8L, 1L, 99L)
    val expect = all.distinct.sorted.take(k)
    assert(agg.finish(agg.merge(agg.merge(a, b), c)) == expect)
    assert(agg.finish(agg.merge(a, agg.merge(b, c))) == expect)
    assert(agg.finish(agg.merge(c, agg.merge(b, a))) == expect)
  }

  test("underfull buffer is the exact distinct set") {
    assert(fold(Seq(4L, 2L, 4L, 2L, 6L)) == Seq(2L, 4L, 6L))
    assert(fold(Nil) == Nil)
  }

  test("distributed sketch equals the single-pass oracle on lineitem") {
    // The sk7 shape: k smallest DISTINCT hashes across partitions must
    // equal a driver-side distinct-sort-take over the same hashes.
    val h = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select((((col("l_orderkey") % 67108864L) * 2654435761L) % 4294967296L)
        .as("hv"))
    val kmv = udaf(Kmv(256), org.apache.spark.sql.Encoders.scalaLong)
    val got = h.repartition(7).agg(kmv(col("hv")).as("ks"))
      .selectExpr("ks").head().getSeq[Long](0)
    val expect = h.distinct().orderBy(col("hv")).limit(256)
      .collect().map(_.getLong(0)).toSeq
    assert(got == expect)
  }
}
