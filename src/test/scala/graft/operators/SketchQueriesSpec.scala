package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables
import graft.functions.TextFunctions

class SketchQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sk1 gate: exact anchors right, every in-bounds boolean true") {
    val rows = SketchQueries.sk1(spark, dir).collect()
    assert(rows.nonEmpty)
    val exact = Tables.documents(spark, dir)
      .select(col("source"), TextFunctions.fingerprint(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("u"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { r =>
      val src = r.getString(0)
      assert((r.getLong(1), r.getLong(2)) === exact(src), s"$src anchors")
      assert(r.getBoolean(3), s"$src hll_ok")
      assert(r.getBoolean(4), s"$src p50_ok")
      assert(r.getBoolean(5), s"$src p95_ok")
    }
  }

  test("raw sketch values sit within tighter empirical bounds of exact answers") {
    val profiled = Tables.documents(spark, dir)
      .select(col("source"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.tokenCount(col("text")).as("toks"))
      .groupBy(col("source"))
      .agg(
        approx_count_distinct(col("fp"), 0.02).as("au"),
        percentile_approx(col("toks"), lit(0.5), lit(5000)).as("ap50"),
        percentile_approx(col("toks"), lit(0.95), lit(5000)).as("ap95"),
        countDistinct(col("fp")).as("unique"),
        expr("percentile(toks, 0.5)").as("p50"),
        expr("percentile(toks, 0.95)").as("p95"))
      .collect()
    assert(profiled.nonEmpty)
    profiled.foreach { r =>
      val src = r.getString(0)
      val (au, eu) = (r.getLong(1).toDouble, r.getLong(4).toDouble)
      assert(math.abs(au - eu) / eu <= 0.1, s"$src: HLL unique $au vs exact $eu")
      // percentile_approx returns a value FROM the data; with accuracy
      // 5000 over these cardinalities it lands within the exact
      // interpolated quantile ± a tight band
      assert(math.abs(r.getLong(2) - r.getDouble(5)) <= math.max(2.0, r.getDouble(5) * 0.05),
        s"$src: p50 ${r.getLong(2)} vs exact ${r.getDouble(5)}")
      assert(math.abs(r.getLong(3) - r.getDouble(6)) <= math.max(2.0, r.getDouble(6) * 0.05),
        s"$src: p95 ${r.getLong(3)} vs exact ${r.getDouble(6)}")
    }
  }

  test("sketches are deterministic across runs") {
    val r1 = SketchQueries.sk1(spark, dir).collect().toSeq
    val r2 = SketchQueries.sk1(spark, dir).collect().toSeq
    assert(r1 === r2)
  }

  test("sk9 on empty view/click populations: kk = 0 defines jaccard 0, no ANSI error") {
    // both sketched populations empty → union sketch is the empty
    // array: element_at(-1) must not raise, and the kk = 0 Jaccard is
    // defined 0 on both engine and oracle sides (ADVICE r7)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sk9-empty")
      .toFile.getAbsolutePath
    Seq((1L, 1000000000000L, 5L, "scroll", 1.0, "{}"),
        (2L, 2000000000000L, 6L, "scroll", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SketchQueries.sk9(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("n_exact_union") === 0L)
    assert(r.getAs[Long]("est_union") === 0L)
    assert(r.getAs[Long]("est_inter") === 0L)
    assert(r.getAs[Long]("jaccard_ppm") === 0L)
  }
}
