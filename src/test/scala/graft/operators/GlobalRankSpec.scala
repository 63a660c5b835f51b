package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[RelationalQueries.globalRank]] — the distributed total-order
  * rank (range partition → per-partition rank → prefix offsets) — to the
  * single-partition `row_number()` reference on a fixture, and pins the
  * property that makes it scale: the data-bearing window is partitioned
  * (only the per-partition OFFSET table, bounded by the shuffle
  * partition count, ever funnels through one task).
  */
class GlobalRankSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // deterministic pseudo-shuffled values with duplicates in the sort
    // prefix (v) so the id tie-breaker is load-bearing
    (1 to 997).map(i => (i.toLong, (i * 7919 % 97).toLong)).toDF("id", "v")
  }

  test("globalRank equals the single-partition row_number reference") {
    val df = fixture
    val got = RelationalQueries
      .globalRank(df, Seq(col("v"), col("id")), "rnk")
      .select(col("id"), col("rnk"))
    val ref = df
      .withColumn("rnk_ref", row_number().over(Window.orderBy(col("v"), col("id"))))
      .select(col("id"), col("rnk_ref"))
    val joined = got.join(ref, Seq("id"))
    assert(joined.filter(col("rnk") =!= col("rnk_ref")).count() === 0L)
    assert(got.count() === 997L)
  }

  test("ranks are a permutation of 1..n (no gaps, no dups across partitions)") {
    val got = RelationalQueries.globalRank(fixture, Seq(col("v"), col("id")), "rnk")
    val agg = got.agg(
      count(lit(1)).as("n"),
      countDistinct(col("rnk")).as("nd"),
      min(col("rnk")).as("lo"),
      max(col("rnk")).as("hi")).head()
    assert(agg.getLong(0) === 997L)
    assert(agg.getLong(1) === 997L)
    assert(agg.getLong(2) === 1L)
    assert(agg.getLong(3) === 997L)
  }

  test("the data-bearing window is partitioned (scale shape)") {
    val plan = RelationalQueries
      .globalRank(fixture, Seq(col("v"), col("id")), "rnk")
      .queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // exactly one unpartitioned window is allowed: the offset table's
    // prefix sum (rows = shuffle partition count, not data)
    assert(windows.count(_.partitionSpec.isEmpty) <= 1)
    assert(windows.exists(_.partitionSpec.nonEmpty))
  }

  test("globalPrefixSums equals the single-partition running-sum reference") {
    import spark.implicits._
    val df = fixture.withColumn("w", (col("id") * 13 % 31).cast("long"))
    val got = RelationalQueries.globalPrefixSums(df,
      Seq(col("v"), col("id")),
      Seq((col("v"), "cum_v"), (col("w"), "cum_w")))
      .select(col("id"), col("cum_v"), col("cum_w"))
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.select(col("id"), sum(col("v")).over(w).as("rv"),
      sum(col("w")).over(w).as("rw"))
    val joined = got.join(ref, Seq("id"))
    assert(joined.filter(
      col("cum_v") =!= col("rv") || col("cum_w") =!= col("rw")).count() === 0L)
    assert(got.count() === 997L)
  }

  test("N fused prefix sums share ONE data-bearing window (scale shape)") {
    val plan = RelationalQueries.globalPrefixSums(fixture,
      Seq(col("v"), col("id")),
      Seq((col("v"), "cum_v"), (col("id"), "cum_id")))
      .queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // the fusion promise: both running sums evaluate in a single
    // partitioned WindowExec (plus the bounded offset-table window)
    assert(windows.count(_.partitionSpec.nonEmpty) === 1)
    assert(windows.count(_.partitionSpec.isEmpty) <= 1)
  }
}
