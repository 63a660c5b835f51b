package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins v27's geometric mechanism (VERDICT r8 item 7): the shared
  * inverse-CDF sampler [[AnalyticsQueries.geometricNoise]] must produce
  * the two-sided-geometric pmf at ε = ln 2 — P(0)=1/3, P(±k)=2^(−k)/3 —
  * when driven by a REAL uniform, and the `spark.graft.dp.noise=random`
  * conf must swap exactly the uniform source: same plan shape, same
  * n_true, different (nondeterministic) noise; the default md5 path
  * stays byte-deterministic so the oracle gate is unchanged.
  */
class GeometricNoiseSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pmf at eps=ln2 from a seeded real uniform: P(0)=1/3, P(±k)=2^-k/3") {
    val n = 600000L
    val draws = spark.range(n)
      .withColumn("u", floor(rand(20260816L) * 4294967296.0).cast("long"))
      .withColumn("noise", AnalyticsQueries.geometricNoise(col("u")))
      .groupBy(col("noise")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def p(k: Long): Double = draws.getOrElse(k, 0L).toDouble / n
    def want(k: Long): Double =
      if (k == 0) 1.0 / 3 else math.pow(2.0, -math.abs(k).toDouble) / 3
    // 600k draws: binomial σ for p=1/3 is ~0.0006 — 5σ tolerance 0.004
    (-4L to 4L).foreach { k =>
      assert(math.abs(p(k) - want(k)) < 0.004,
        f"P($k): got ${p(k)}%.5f want ${want(k)}%.5f")
    }
    // symmetry and zero mean (|mean| of the two-sided geometric at this
    // sample size stays well under 0.01)
    val mean = draws.map { case (k, c) => k.toDouble * c }.sum / n
    assert(math.abs(mean) < 0.01, s"mean $mean")
  }

  test("conf switches ONLY the uniform source; the gate path is unchanged") {
    // default (deterministic md5): two runs byte-equal — the oracle gate
    val a = AnalyticsQueries.v27(spark, sf).collect().map(_.toSeq)
    val b = AnalyticsQueries.v27(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "default md5 path must be deterministic")

    spark.conf.set("spark.graft.dp.noise", "random")
    try {
      val r = AnalyticsQueries.v27(spark, sf)
      // identical schema and identical n_true by group — only the noise
      // source moved
      assert(r.columns.toSeq == Seq("source", "lang", "n_true", "noise", "n_released"))
      val rr = r.collect()
      val trueCounts = rr.map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
      val detTrue = a.map(x => (x(0), x(1)) -> x(2)).toMap
      assert(trueCounts.map { case ((s, l), v) => ((s: Any, l: Any), v: Any) } == detTrue,
        "n_true must not depend on the noise source")
      // released counts stay clamped at zero
      assert(rr.forall(x => x.getLong(4) >= 0L))
    } finally spark.conf.unset("spark.graft.dp.noise")
  }
}
