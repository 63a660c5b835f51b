package graft.joins

import graft.SparkSpec
import graft.operators.Interval
import graft.plans.{BroadcastIntervalJoinExec, IntervalJoinExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the broadcast interval-join path
  * ([[graft.plans.BroadcastIntervalJoinExec]] + the size-based choice
  * in IntervalJoinStrategy): physical selection by threshold, ZERO
  * shuffle exchanges on the chosen plan, and bit-identical results to
  * the sort-merge exec on a randomized fixture including nulls,
  * duplicates, and keys absent from either side — the two execs are
  * alternative physical strategies for ONE operator and must be
  * observationally indistinguishable.
  */
class BroadcastIntervalJoinSpec extends SparkSpec {

  private def mix(i: Long, salt: Long): Long =
    ((i * 2654435761L + salt) % 4294967296L).abs

  private def points: DataFrame = {
    val ss = spark; import ss.implicits._
    ((0L until 500L).map(i =>
      (Option(mix(i, 17) % 25).filter(_ => i % 97 != 0),
        Option(mix(i, 31) % 1000).filter(_ => i % 89 != 0), i)) :+
      ((Some(7L), Some(500L), 9001L)) :+ ((Some(7L), Some(500L), 9001L)))
      .toDF("k", "t", "lid").repartition(5)
  }

  private def spans: DataFrame = {
    val ss = spark; import ss.implicits._
    ((0L until 300L).map { i =>
      val lo = mix(i, 13) % 1000
      (Option(mix(i, 7) % 25).filter(_ => i % 83 != 0),
        Option(lo).filter(_ => i % 79 != 0),
        Option(lo + mix(i, 43) % 60).filter(_ => i % 73 != 0), i)
    } :+ ((Some(7L), Some(480L), Some(520L), 9100L))
      :+ ((Some(7L), Some(480L), Some(520L), 9100L)))
      .toDF("k", "lo", "hi", "rid").repartition(3)
  }

  private def run(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("strategy picks broadcast under the threshold, sort-merge over it") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = Interval.join(points, spans, Seq("k"), "t", "lo", "hi")
      val bPlan = joined.queryExecution.executedPlan
      assert(bPlan.collect { case e: BroadcastIntervalJoinExec => e }.size == 1,
        bPlan.toString)
      // zero strategy-inserted shuffles (the fixtures' own explicit
      // repartitions are REPARTITION_BY_NUM, not EnsureRequirements):
      // the whole point of the broadcast strategy
      assert(bPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.shuffleOrigin ==
              org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS => e
      }.isEmpty, bPlan.toString)
      assert(bPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
      }.size == 1, bPlan.toString)

      spark.conf.set("spark.graft.intervalJoin.broadcastThreshold", "-1")
      val sPlan = try {
        Interval.join(points, spans, Seq("k"), "t", "lo", "hi")
          .queryExecution.executedPlan
      } finally spark.conf.unset("spark.graft.intervalJoin.broadcastThreshold")
      assert(sPlan.collect { case e: IntervalJoinExec => e }.size == 1,
        sPlan.toString)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("broadcast and sort-merge execs agree exactly (nulls, dupes, misses)") {
    val broadcastRes = run(
      Interval.join(points, spans, Seq("k"), "t", "lo", "hi"))
    spark.conf.set("spark.graft.intervalJoin.broadcastThreshold", "-1")
    val smjRes = try {
      run(Interval.join(points, spans, Seq("k"), "t", "lo", "hi"))
    } finally spark.conf.unset("spark.graft.intervalJoin.broadcastThreshold")
    assert(broadcastRes.nonEmpty) // the fixture must exercise matches
    assert(broadcastRes.size == smjRes.size)
    assert(broadcastRes.sorted == smjRes.sorted)
    // duplicate point × duplicate span multiplicity: 2 × 2 = 4 pairs
    assert(broadcastRes.count(p => p == (9001L, 9100L)) == 4)
    // and parity with Spark's own composed join
    val composed = run(points.join(
      spans.withColumnRenamed("k", "k2"),
      col("k") === col("k2") && col("t") >= col("lo") && col("t") <= col("hi")))
    assert(broadcastRes.sorted == composed.sorted)
  }

  test("broadcast path preserves the left side's partitioning (no exchange)") {
    val ss = spark; import ss.implicits._
    // downstream groupBy on the PRE-PARTITIONED left key must not add
    // any EnsureRequirements shuffle: the join passes the left's
    // hash(k) partitioning through and the aggregate reuses it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = (0L until 200L).map(i => (mix(i, 17) % 25, mix(i, 31) % 1000, i))
        .toDF("k", "t", "lid").repartition(4, col("k"))
      val agg = Interval.join(p, spans, Seq("k"), "t", "lo", "hi")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
      val ensured = agg.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.shuffleOrigin ==
              org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS => e
      }
      assert(ensured.isEmpty, agg.queryExecution.executedPlan.toString)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
