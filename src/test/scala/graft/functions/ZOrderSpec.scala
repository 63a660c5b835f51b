package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the Morton-curve properties x13's layout claim rests on:
  * round-trip bit interleaving, the tile bound (an aligned 4^m-cell
  * z-range is exactly a 2^m × 2^m rectangle), monotone locality, and
  * agreement between the Column form and the SQL text used by the
  * oracle.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def zRef(a: Int, b: Int, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1).toLong << (2 * i + 1)) | (((b >> i) & 1).toLong << (2 * i))
    }.reduce(_ | _)

  test("column expression matches the reference interleave on the full 8-bit grid") {
    val grid = for (a <- 0 until 256; b <- 0 until 256) yield (a, b)
    val got = grid.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue2($"a", $"b", 8).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    grid.foreach { case (a, b) =>
      assert(got((a, b)) === zRef(a, b, 8), s"($a, $b)")
    }
    // bijection: 65536 distinct z-values covering [0, 65536)
    assert(got.values.toSet.size === 65536 && got.values.max === 65535L)
  }

  test("SQL text form agrees with the column form") {
    val df = (0 until 256).map(i => (i * 17 % 256, i * 101 % 256)).toDF("a", "b")
    val both = df.select(
      ZOrder.zValue2($"a", $"b", 8).as("zc"),
      expr(s"CAST(${ZOrder.zValue2Sql("a", "b", 8)} AS BIGINT)").as("zs"))
    assert(both.filter($"zc" =!= $"zs").count() === 0)
  }

  test("aligned 64-cell z-ranges are exactly 8x8 tiles (the data-skipping bound)") {
    val grid = for (a <- 0 until 256; b <- 0 until 256) yield (a, b)
    val spans = grid.toDF("a", "b")
      .withColumn("bucket", expr(
        s"CAST(${ZOrder.zValue2Sql("a", "b", 8)} AS BIGINT) div 64"))
      .groupBy($"bucket")
      .agg((max($"a") - min($"a")).as("sa"), (max($"b") - min($"b")).as("sb"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.length === 1024)
    spans.foreach { r =>
      assert(r.getAs[Int]("sa") === 7 && r.getAs[Int]("sb") === 7 &&
        r.getAs[Long]("n") === 64L, s"bucket ${r.get(0)} is not a full 8x8 tile")
    }
  }
}
