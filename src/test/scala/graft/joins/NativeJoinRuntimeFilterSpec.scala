package graft.joins

import graft.SparkSpec
import graft.operators.{AsOf, Interval}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._

/** Pins [[graft.plans.NativeJoinRuntimeFilter]]: the Bloom runtime
  * filter Spark's `InjectRuntimeFilter` gives equi-joins, re-planted
  * for the native as-of/interval nodes. Contract surfaces: the filter
  * fires under the size gates (and ONLY under them), lands on the
  * legal side per operator (right for as-of — left rows always emit;
  * either for interval), injects exactly once per key set
  * (fixed-point idempotence), results stay bit-identical with the
  * rule on/off including null-key rows, and the kill switch works.
  */
class NativeJoinRuntimeFilterSpec extends SparkSpec {

  private val confKeys = Seq(
    "spark.graft.runtimeFilter.enabled",
    "spark.graft.runtimeFilter.creationSideThreshold",
    "spark.graft.runtimeFilter.applicationSideThreshold",
    "spark.graft.asOfJoin.broadcastThreshold",
    "spark.graft.intervalJoin.broadcastThreshold")

  private def withForcedFilter[A](body: => A): A = {
    val saved = confKeys.map(k => k -> spark.conf.getOption(k))
    // application gate to 0 and creation gate to MaxValue so the tiny
    // spec frames clear both, and broadcast off so the sort-merge path
    // (the one with an exchange to prune) is what plans
    spark.conf.set("spark.graft.runtimeFilter.applicationSideThreshold", "0")
    spark.conf.set("spark.graft.runtimeFilter.creationSideThreshold",
      Long.MaxValue.toString)
    spark.conf.set("spark.graft.asOfJoin.broadcastThreshold", "-1")
    spark.conf.set("spark.graft.intervalJoin.broadcastThreshold", "-1")
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def bloomFilters(df: DataFrame): Seq[Filter] =
    df.queryExecution.optimizedPlan.collect {
      case f @ Filter(cond, _)
          if cond.exists(_.isInstanceOf[BloomFilterMightContain]) => f
    }

  private def left(): DataFrame = {
    val ss = spark; import ss.implicits._
    Seq((1L, Some(10L), Some(100L)), (2L, Some(20L), Some(200L)),
      (3L, None, Some(150L)), (4L, Some(10L), None))
      .toDF("lid", "k", "t")
  }

  private def right(): DataFrame = {
    val ss = spark; import ss.implicits._
    // keys 10/20 match the left; 30..99 exist only here (the rows the
    // bloom is there to prune); plus a null key and a null time
    (Seq((Some(10L), Some(50L), 11L), (Some(10L), Some(150L), 12L),
      (Some(20L), Some(100L), 13L), (None, Some(100L), 14L),
      (Some(10L), None, 15L)) ++
      (30L to 99L).map(k => (Some(k), Some(100L), k * 100)))
      .toDF("k", "rt", "rid").repartition(3)
  }

  private def intervals(): DataFrame = {
    val ss = spark; import ss.implicits._
    (Seq((Some(10L), Some(50L), Some(150L), 1L),
      (Some(20L), Some(150L), Some(250L), 2L),
      (None, Some(0L), Some(999L), 3L)) ++
      (30L to 99L).map(k => (Some(k), Some(0L), Some(999L), k)))
      .toDF("k", "lo", "hi", "iid").repartition(3)
  }

  test("as-of: bloom lands on the right side once, results identical on/off") {
    val (filtered, plain) = withForcedFilter {
      val f = AsOf.joinBackward(left(), right(), Seq("k"), "t", "rt")
        .orderBy("lid")
      val rows = f.collect()
      val p = {
        spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
        try AsOf.joinBackward(left(), right(), Seq("k"), "t", "rt")
          .orderBy("lid")
        finally spark.conf.unset("spark.graft.runtimeFilter.enabled")
      }
      assert(bloomFilters(f).size === 1, "exactly one bloom filter expected")
      // it must sit on the RIGHT branch: the filtered side carries rid
      val onRight = bloomFilters(f).head.output.exists(_.name == "rid")
      assert(onRight, "as-of bloom must prune the right side only")
      (rows, p.collect())
    }
    assert(filtered.toSeq === plain.toSeq)
    // all four left rows survive (left-outer contract), nulls included
    assert(filtered.length === 4)
  }

  test("as-of: default thresholds keep tiny plans untouched; kill switch wins over forced gates") {
    val normal = AsOf.joinBackward(left(), right(), Seq("k"), "t", "rt")
    assert(bloomFilters(normal).isEmpty,
      "tiny application side is below the 1 GB default gate")
    withForcedFilter {
      spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
      try {
        val off = AsOf.joinBackward(left(), right(), Seq("k"), "t", "rt")
        assert(bloomFilters(off).isEmpty, "kill switch must suppress injection")
      } finally spark.conf.unset("spark.graft.runtimeFilter.enabled")
    }
  }

  test("interval: bloom fires and the inner join results stay identical on/off") {
    val (filtered, plain) = withForcedFilter {
      val f = Interval.join(left(), intervals(), Seq("k"), "t", "lo", "hi")
        .orderBy("lid", "iid")
      val rows = f.collect()
      assert(bloomFilters(f).size === 1)
      val p = {
        spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
        try Interval.join(left(), intervals(), Seq("k"), "t", "lo", "hi")
          .orderBy("lid", "iid")
        finally spark.conf.unset("spark.graft.runtimeFilter.enabled")
      }
      (rows, p.collect())
    }
    assert(filtered.toSeq === plain.toSeq)
    assert(filtered.nonEmpty)
  }

  test("x73 gate: executes under the forced gates, then restores every conf") {
    val before = confKeys.map(k => spark.conf.getOption(k))
    val rows = graft.operators.CrossQueries.queries("x73_asof_rtfilter")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(confKeys.map(k => spark.conf.getOption(k)) === before,
      "gate must leave no runtime-filter confs behind")
  }

  test("idempotence: re-optimizing an already-filtered plan adds nothing") {
    withForcedFilter {
      val f = AsOf.joinBackward(left(), right(), Seq("k"), "t", "rt")
      val once = bloomFilters(f)
      assert(once.size === 1)
      // run the optimizer output through the rule again by hand
      val again = graft.plans.NativeJoinRuntimeFilter(
        f.queryExecution.optimizedPlan)
      val blooms = again.collect {
        case fl @ Filter(cond, _)
            if cond.exists(_.isInstanceOf[BloomFilterMightContain]) => fl
      }
      assert(blooms.size === 1, "second pass must not stack a second bloom")
    }
  }
}
