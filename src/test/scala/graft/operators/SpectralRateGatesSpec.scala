package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the spectral / projection / rate-limit gates
  * (s30/s31/x59/st26) that the hash oracles can't articulate: the
  * distributed power iteration re-proved against an independent
  * sequential BigInt reference, JL rank bounds, and batch-vs-streaming
  * GCRA parity — two execution models (one shuffle + mapGroups vs
  * transformWithState micro-batches) must agree user for user.
  */
class SpectralRateGatesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("s30 equals an independent sequential BigInt power iteration") {
    val rows = SimilarityQueries.queries("s30_pca_power")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0)
        .map(x => BigInt(math.floor(x.toDouble * 1e6).toLong)).toArray)
    val d = 64
    val n = BigInt(vecs.length)
    val sums = Array.tabulate(d)(j => vecs.map(_(j)).sum)
    val c = Array.tabulate(d, d)((i, j) =>
      n * vecs.map(v => v(i) * v(j)).sum - sums(i) * sums(j))
    var v = Array.fill(d)(BigInt(1000000))
    for (_ <- 1 to 15) {
      val nv = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      val mx = nv.map(_.abs).max.max(BigInt(1))
      v = nv.map(x => x * 1000000 / mx)
    }
    assert(rows.length === d)
    rows.foreach { case (i, comp, _) => assert(comp === v(i.toInt).toLong) }
    // normalization contract: some component hits ±1e6, none exceed it
    assert(rows.map(_._2.abs).max === 1000000L)
    // explained variance is one constant in [0, 1e6] (it is a ratio)
    val evs = rows.map(_._3).distinct
    assert(evs.length === 1 && evs.head >= 0L && evs.head <= 1000000L)
  }

  test("s31 rank bounds: overlap in [0,10], projected NN rank >= 1") {
    val rows = SimilarityQueries.queries("s31_jl_neighbors")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nCand = graft.Tables.embeddings(spark, dir).count() - 1
    assert(rows.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    rows.foreach { case (_, overlap, nnRank) =>
      assert(overlap >= 0L && overlap <= 10L)
      assert(nnRank >= 1L && nnRank <= nCand)
      // the true NN in projected top-10 implies a nonzero overlap
      if (nnRank <= 10L) assert(overlap >= 1L)
    }
  }

  test("x62 window-funnel DP equals the brute-force EXISTS chains") {
    val T = 3600000000L
    val got = CrossQueries.queries("x62_window_funnel")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        graft.streaming.Streaming.tsMicros(col("ts")).as("tsu"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = e.groupBy(_._1)
    val levels = byUser.map { case (_, evs) =>
      val v = evs.filter(_._2 == "view").map(_._3)
      val c = evs.filter(_._2 == "click").map(_._3)
      val p = evs.filter(_._2 == "purchase").map(_._3)
      if (v.isEmpty) 0L
      else {
        val c2 = c.filter(ct => v.exists(vt => ct > vt && ct - vt <= T))
        val l3 = p.exists(pt => c2.exists(ct => pt > ct && pt - ct <= T))
        if (l3) 3L else if (c2.nonEmpty) 2L else 1L
      }
    }.filter(_ > 0L)
    val expect = levels.groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
    assert(got === expect)
  }

  test("st26 streaming decisions aggregate to x59's batch counts") {
    val dec = StreamingQueries.queries("st26_rate_limit")(spark, dir)
    val agg = dec.groupBy(col("user_id"))
      .agg(sum(when(col("admitted"), 1L).otherwise(0L)).as("admitted"),
        sum(when(col("admitted"), 0L).otherwise(1L)).as("rejected"))
    val batch = StatQueries.queries("x59_rate_limit")(spark, dir)
    assert(agg.except(batch).count() === 0L)
    assert(batch.except(agg).count() === 0L)
  }

  test("x59 GCRA contracts: totals, first-admit, capacity bound") {
    val batch = StatQueries.queries("x59_rate_limit")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        graft.streaming.Streaming.tsMicros(col("ts")).as("tsu"))
    val spans = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), (max(col("tsu")) - min(col("tsu"))).as("span"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(batch.keySet === spans.keySet)
    val T = 30000000L
    batch.foreach { case (uid, (adm, rej)) =>
      val (nEv, span) = spans(uid)
      assert(adm + rej === nEv)
      assert(adm >= 1L) // the first event always admits (tat seeds at 0)
      // capacity: span/T steady-state admissions + the 2T burst + the seed
      assert(adm <= span / T + 3L)
    }
    // per-event first-admit: the earliest event of every user admits
    val first = ev.withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("tsu"), col("event_id"))))
      .filter(col("rn") === 1).select(col("event_id"))
    val dec = StreamingQueries.queries("st26_rate_limit")(spark, dir)
    assert(dec.join(first, Seq("event_id")).filter(!col("admitted"))
      .count() === 0L)
  }
}
