package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BitmapDistinctSpec extends SparkSpec {
  import BitmapDistinctAggregator._

  private val agg = BitmapDistinct

  private def fold(xs: Seq[Long]): Long =
    agg.finish(xs.foldLeft(agg.zero)(agg.reduce))

  test("finish counts the distinct set on any fold order") {
    val xs = Seq(9L, 3L, 9L, 64L, 3L, 0L, 127L, 128L, 63L, 64L, 40L)
    assert(fold(xs) == xs.distinct.size.toLong)
    assert(fold(xs.reverse) == xs.distinct.size.toLong)
    assert(fold(Nil) == 0L)
  }

  test("ids sharing a word vs spanning words both count exactly") {
    assert(fold(Seq(0L, 1L, 62L, 63L)) == 4L)        // one word
    assert(fold(Seq(0L, 64L, 128L, 192L)) == 4L)     // one bit per word
    assert(fold(Seq(-1L, -64L, -65L, 1L)) == 4L)     // negative ids legal
  }

  test("merge is word-wise OR: commutative, associative, idempotent") {
    val a = Seq(5L, 1L, 900L, 120L, 7L).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(2L, 5L, 300L, 4L, 11L).foldLeft(agg.zero)(agg.reduce)
    val c = Seq(3L, 8L, 1L, 99L).foldLeft(agg.zero)(agg.reduce)
    val expect = Seq(5L, 1L, 900L, 120L, 7L, 2L, 300L, 4L, 11L, 3L, 8L, 99L)
      .distinct.size.toLong
    assert(agg.finish(agg.merge(agg.merge(a, b), c)) == expect)
    assert(agg.finish(agg.merge(a, agg.merge(b, c))) == expect)
    assert(agg.finish(agg.merge(c, agg.merge(b, a))) == expect)
    assert(agg.finish(agg.merge(a, a)) == 5L)
  }

  test("distributed count equals countDistinct on orders (multi-partition)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val bm = udaf(BitmapDistinct, org.apache.spark.sql.Encoders.scalaLong)
    val got = orders.repartition(7)
      .groupBy(col("o_orderpriority"))
      .agg(bm(col("o_custkey")).as("bm"),
        countDistinct(col("o_custkey")).as("cd"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"priority ${r.getString(0)}: bitmap ${r.getLong(1)} != exact ${r.getLong(2)}"))
  }
}
