package graft.joins

import graft.SparkSpec
import graft.operators.AsOf
import graft.plans.{AsOfJoinExec, BroadcastAsOfJoinExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the broadcast as-of path ([[graft.plans.BroadcastAsOfJoinExec]]
  * + the size-based choice in AsOfJoinStrategy): physical selection by
  * threshold, zero strategy-inserted exchanges, and exact agreement
  * with the sort-merge exec across directions, tolerance, nulls, and
  * missing keys on a randomized fixture — the two execs are
  * alternative physical strategies for ONE operator.
  */
class BroadcastAsOfJoinSpec extends SparkSpec {

  private def mix(i: Long, salt: Long): Long =
    ((i * 2654435761L + salt) % 4294967296L).abs

  private def leftDf: DataFrame = {
    val ss = spark; import ss.implicits._
    (0L until 400L).map(i =>
      (Option(mix(i, 17) % 20).filter(_ => i % 97 != 0),
        Option(mix(i, 31) % 1000).filter(_ => i % 89 != 0), i))
      .toDF("k", "t", "lid").repartition(5)
  }

  // unique (k, rt): the match is well-defined, so the two execs (and
  // runs) must agree bit-for-bit
  private def rightDf: DataFrame = {
    val ss = spark; import ss.implicits._
    (0L until 300L).map(i => (mix(i, 7) % 20, mix(i, 13) % 1000, i))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      .map { case (k, rt, rid) =>
        (Option(k).filter(_ => rid % 83 != 0),
          Option(rt).filter(_ => rid % 79 != 0), rid)
      }
      .toDF("k", "rt", "rid").repartition(4)
  }

  private def run(df: DataFrame): Map[Long, Long] =
    df.select(col("lid"), coalesce(col("rid"), lit(-1L)).as("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  private def withSmj[T](body: => T): T = {
    spark.conf.set("spark.graft.asOfJoin.broadcastThreshold", "-1")
    try body
    finally spark.conf.unset("spark.graft.asOfJoin.broadcastThreshold")
  }

  test("strategy picks broadcast under the threshold, sort-merge over it") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bPlan = AsOf.joinBackward(leftDf, rightDf, Seq("k"), "t", "rt")
        .queryExecution.executedPlan
      assert(bPlan.collect { case e: BroadcastAsOfJoinExec => e }.size == 1,
        bPlan.toString)
      assert(bPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.shuffleOrigin ==
              org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS => e
      }.isEmpty, bPlan.toString)
      val sPlan = withSmj {
        AsOf.joinBackward(leftDf, rightDf, Seq("k"), "t", "rt")
          .queryExecution.executedPlan
      }
      assert(sPlan.collect { case e: AsOfJoinExec => e }.size == 1,
        sPlan.toString)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("broadcast and sort-merge agree: backward, forward, tolerance, nulls") {
    def both(mk: => DataFrame): (Map[Long, Long], Map[Long, Long]) = {
      val b = run(mk)
      val s = withSmj { run(mk) }
      (b, s)
    }
    val (b1, s1) = both(
      AsOf.joinBackward(leftDf, rightDf, Seq("k"), "t", "rt"))
    assert(b1.size == 400 && b1 == s1)
    assert(b1.values.exists(_ >= 0)) // matches exercised
    assert(b1.values.exists(_ == -1L)) // null-extension exercised
    val (b2, s2) = both(
      AsOf.joinForward(leftDf, rightDf, Seq("k"), "t", "rt"))
    assert(b2.size == 400 && b2 == s2)
    val (b3, s3) = both(AsOf.joinBackward(
      leftDf, rightDf, Seq("k"), "t", "rt", toleranceMicros = Some(50L)))
    assert(b3.size == 400 && b3 == s3)
    // tolerance actually binds: strictly fewer matches than unbounded
    assert(b3.values.count(_ >= 0) < b1.values.count(_ >= 0))
    val (b4, s4) = both(AsOf.joinForward(
      leftDf, rightDf, Seq("k"), "t", "rt", toleranceMicros = Some(50L)))
    assert(b4.size == 400 && b4 == s4)
  }
}
