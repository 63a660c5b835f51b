package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Cross-gate invariants for the analytics family (q40/x28/x29/d16) —
  * properties the DuckDB hash-compare can't express because they relate
  * a gate's output to the base tables or to another gate. */
class AnalyticsQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q40_rfm: cells partition the customer base and scores stay in 1..5") {
    val cells = AnalyticsQueries.q40(spark, dir).cache()
    val nCust = Tables.orders(spark, dir).select(col("o_custkey")).distinct().count()
    assert(cells.agg(sum(col("n_customers"))).head.getLong(0) === nCust)
    val bad = cells.filter(
      col("r_score") < 1 || col("r_score") > 5 ||
        col("f_score") < 1 || col("f_score") > 5 ||
        col("m_score") < 1 || col("m_score") > 5).count()
    assert(bad === 0)
    // total money in cells == total money in orders (cents are exact)
    val cellCents = cells.agg(sum(col("cell_cents"))).head.getLong(0)
    val orderCents = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") * 100).cast("long").as("c"))
      .agg(sum(col("c"))).head.getLong(0)
    assert(cellCents === orderCents)
    cells.unpersist()
  }

  test("x28_seasonality: shares reconcile and the index averages one") {
    val rows = AnalyticsQueries.x28(spark, dir).collect()
    assert(rows.length === 7)
    // Σ index_ppm = 7e6 up to 7 units of div-truncation
    val s = rows.map(_.getAs[Long]("index_ppm")).sum
    assert(s > 7000000L - 7 && s <= 7000000L)
    val orderCount = Tables.orders(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === orderCount)
  }

  test("x29_rolling_wau: WAU dominates DAU and never exceeds the 7-day union bound") {
    val wau = AnalyticsQueries.x29(spark, dir)
      .collect().map(r => r.getAs[Long]("day_num") -> r.getAs[Long]("wau")).toMap
    val dau = Tables.events(spark, dir).filter(col("ts").isNotNull)
      .select(col("user_id"),
        graft.streaming.Streaming.tsMicros(col("ts")).cast("long").as("tsu"))
      .select(col("user_id"), expr("tsu div 86400000000").as("day"))
      .distinct().groupBy(col("day")).agg(count(lit(1)).as("dau"))
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("dau")).toMap
    assert(wau.nonEmpty)
    wau.foreach { case (d, w) =>
      val window = (d - 6 to d).flatMap(dau.get)
      assert(w >= window.max, s"day $d: wau $w < max daily ${window.max}")
      assert(w <= window.sum, s"day $d: wau $w > 7-day union bound ${window.sum}")
    }
  }

  test("globalPrefixSum == single-window running sum, at any partition count") {
    import spark.implicits._
    val df = spark.range(1, 1001).select(
      (col("id") * 37 % 1000).as("k"), (col("id") % 13).as("v"))
    val expected = df
      .withColumn("run", sum(col("v")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("v"))
          .rowsBetween(Long.MinValue, 0)))
      .orderBy(col("k"), col("v")).collect().map(_.getLong(2))
    for (parts <- Seq(1, 7, 32)) {
      val got = RelationalQueries.globalPrefixSum(df.repartition(parts),
        Seq(col("k"), col("v")), col("v"), "run")
        .orderBy(col("k"), col("v")).collect().map(_.getLong(2))
      assert(got.toSeq === expected.toSeq, s"parts=$parts")
    }
  }

  test("x30_abc_pareto: classes partition parts and respect the Pareto cuts") {
    val cls = AnalyticsQueries.x30(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), floor(col("l_extendedprice") * 100).cast("long").as("c"))
    val total = li.agg(sum(col("c"))).head.getLong(0)
    val nParts = li.select(col("l_partkey")).distinct().count()
    assert(cls.values.map(_._1).sum === nParts)
    assert(cls.values.map(_._2).sum === total)
    // the A class never exceeds 80% of revenue; A+B never exceeds 95%
    assert(cls("A")._2 * 100 <= total * 80)
    assert((cls("A")._2 + cls("B")._2) * 100 <= total * 95)
  }

  test("v18_skew_audit: hot key dominates the median on every key column") {
    val rows = AnalyticsQueries.v18(spark, dir).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("median_cnt") <= r.getAs[Long]("max_cnt"))
      assert(r.getAs[Long]("skew_ppm") >= 1000000L)
    }
  }

  test("v19_dq_suite: the clean gate data passes every check") {
    val rows = AnalyticsQueries.v19(spark, dir).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Boolean]("passed")))
  }

  test("t31_vocab_growth: the curve ends at the corpus vocabulary size") {
    import graft.functions.TextFunctions
    val curve = AnalyticsQueries.t31(spark, dir).orderBy(col("doc_id")).collect()
    val vocab = Tables.documents(spark, dir)
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .distinct().count()
    assert(curve.last.getAs[Long]("vocab_cum") === vocab)
    assert(curve.map(_.getAs[Long]("new_terms")).sum === vocab)
    // running sum is strictly increasing (every emitted doc adds terms)
    assert(curve.map(_.getAs[Long]("vocab_cum")).toSeq ===
      curve.map(_.getAs[Long]("vocab_cum")).sorted.toSeq)
  }

  test("x31_compaction_plan: bins cover all rows in contiguous month ranges") {
    val bins = AnalyticsQueries.x31(spark, dir).orderBy(col("bin")).collect()
    val total = Tables.lineitem(spark, dir).count()
    assert(bins.map(_.getAs[Long]("bin_rows")).sum === total)
    // contiguous, non-overlapping date ranges (clustering preserved)
    bins.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[String]("month_to") <= b.getAs[String]("month_from"))
      case _ => ()
    }
  }

  test("q41_chi2: marginals reconcile and contributions are non-negative") {
    val rows = AnalyticsQueries.q41(spark, dir).collect()
    val nCust = Tables.customer(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_cust")).sum === nCust)
    assert(rows.forall(_.getAs[Long]("chi2_milli") >= 0L))
  }

  test("s21_neighbor_jaccard: pairs are canonical and jaccard is a true ratio") {
    val p = SimilarityQueries.s21(spark, dir)
    assert(p.filter(col("node_a") >= col("node_b")).count() === 0)
    assert(p.filter(col("jac_ppm") > 1000000L || col("jac_ppm") < 400000L).count() === 0)
    // symmetric-by-construction: each unordered pair appears exactly once
    assert(p.groupBy(col("node_a"), col("node_b")).count()
      .filter(col("count") > 1).count() === 0)
  }

  test("st18_stream_wau agrees with batch x29 on every day both emit") {
    val batch = AnalyticsQueries.x29(spark, dir)
      .collect().map(r => r.getAs[Long]("day_num") -> r.getAs[Long]("wau")).toMap
    val stream = StreamingQueries.st18(spark, dir)
      .collect().map(r => r.getAs[Long]("day_num") -> r.getAs[Long]("wau")).toMap
    val shared = batch.keySet.intersect(stream.keySet)
    assert(shared.nonEmpty)
    shared.foreach { d =>
      assert(batch(d) === stream(d), s"day $d: batch ${batch(d)} vs stream ${stream(d)}")
    }
    // the stream also emits the trailing-edge days past the batch bound
    assert(stream.keySet.max > batch.keySet.max)
  }

  test("v20_drift_tvd: shares are per-epoch distributions and diffs are consistent") {
    val rows = AnalyticsQueries.v20(spark, dir).collect()
    val nOrders = Tables.orders(spark, dir).count()
    assert(rows.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum === nOrders)
    // each epoch's shares sum to 1e6 up to per-category truncation
    for (c <- Seq("share_a_ppm", "share_b_ppm")) {
      val s = rows.map(_.getAs[Long](c)).sum
      assert(s > 1000000L - rows.length && s <= 1000000L, s"$c sums to $s")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("abs_diff_ppm") ===
        math.abs(r.getAs[Long]("share_a_ppm") - r.getAs[Long]("share_b_ppm")))
    }
  }

  test("x32_purchase_intervals: every repeat order contributes exactly one gap") {
    val rows = AnalyticsQueries.x32(spark, dir).collect()
    val o = Tables.orders(spark, dir)
    val nOrders = o.count()
    val nCustomers = o.select(col("o_custkey")).distinct().count()
    // gaps = orders − customers (each customer's first order has no gap)
    assert(rows.map(_.getAs[Long]("n_gaps")).sum === nOrders - nCustomers)
    assert(rows.forall(_.getAs[Long]("sum_gap_days") >= 0L))
  }

  test("d17_minhash_eval: confusion counts are internally consistent") {
    val r = DedupQueries.d17(spark, dir).head
    val (nMh, nTrue) = (r.getAs[Long]("n_mh"), r.getAs[Long]("n_true"))
    val (tpMh, tpBl) = (r.getAs[Long]("tp_mh"), r.getAs[Long]("tp_bl"))
    assert(nTrue > 0, "gate data must contain true near-dup pairs")
    assert(tpMh <= nMh && tpMh <= nTrue && tpBl <= nTrue)
    assert(r.getAs[Long]("precision_mh_ppm") <= 1000000L)
    assert(r.getAs[Long]("recall_mh_ppm") <= 1000000L)
    // every true pair was surfaced by at least one generator
    assert(tpMh + tpBl >= nTrue)
  }

  test("d16_containment: full containment is genuine subset inclusion") {
    import graft.dedup.Dedup
    val pairs = AnalyticsQueries.d16(spark, dir)
    // shared never exceeds the contained side's rare-set size
    assert(pairs.filter(col("shared") > col("na")).count() === 0)
    // for a containment=1e6 pair, doc_a's rare shingles ⊆ doc_b's full set
    val full = pairs.filter(col("containment_ppm") === 1000000L)
      .select(col("doc_a"), col("doc_b")).collect()
    assert(full.nonEmpty, "gate data should contain at least one full-containment pair")
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.shingleHashesExpr(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // df-capped universe: recompute df over all docs
    val dfCount = sh.values.toSeq.flatMap(_.toSeq).groupBy(identity)
      .map { case (k, v) => k -> v.size }
    val Seq(a, b) = Seq(full.head.getLong(0), full.head.getLong(1))
    val rareA = sh(a).filter(dfCount(_) <= 20)
    assert(rareA.subsetOf(sh(b)))
  }
}
