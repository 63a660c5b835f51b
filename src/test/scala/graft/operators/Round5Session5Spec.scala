package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-5 session-5 gates that the hash oracles
  * can't express directly: FIFO conservation, exact-split
  * reconciliation, hierarchy partition totals, PPR mass properties, and
  * k-means membership accounting.
  */
class Round5Session5Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("x21 FIFO allocation is exactly min(supply, demand) per key") {
    val rows = CrossQueries.queries("x21_fifo_allocation")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (supply, demand, allocated) =
        (r.getAs[Long]("supply"), r.getAs[Long]("demand"), r.getAs[Long]("allocated"))
      // FIFO over cumulative intervals [0,S)×[0,D) always allocates the
      // full overlap — anything less means the staircase join dropped a pair
      assert(allocated === math.min(supply, demand),
        s"part ${r.getLong(0)}: allocated $allocated != min($supply, $demand)")
      assert(r.getAs[Long]("leftover") >= 0 && r.getAs[Long]("unfilled") >= 0)
      assert(r.getAs[Long]("leftover") == 0L || r.getAs[Long]("unfilled") == 0L)
    }
  }

  test("x22 streak accounting: longest <= active days, last_day is max") {
    val rows = CrossQueries.queries("x22_streaks")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (active, streaks, longest) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(longest <= active && longest >= 1)
      assert(streaks <= active, "more streaks than active days")
      // n streaks of total length `active`: longest >= ceil(active/streaks)
      assert(longest >= (active + streaks - 1) / streaks)
    }
  }

  test("x23 EWMA stays inside the per-customer cents envelope") {
    import spark.implicits._
    val bounds = graft.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(min(floor(col("o_totalprice") * 100).cast("long")).as("lo"),
        max(floor(col("o_totalprice") * 100).cast("long")).as("hi"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val rows = CrossQueries.queries("x23_ewma")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cust, ewma) = (r.getLong(0), r.getLong(2))
      val (lo, hi) = bounds(cust)
      // a convex combination of observed values (truncation only pulls
      // down by < 1 millicent per step) cannot escape the envelope
      assert(ewma >= lo * 1000L - 1000L && ewma <= hi * 1000L,
        s"cust $cust: ewma $ewma outside [${lo * 1000}, ${hi * 1000}]")
    }
  }

  test("x24 top-level subtrees partition the whole part table") {
    val rows = CrossQueries.queries("x24_hierarchy_rollup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // partkey 0 is the (virtual) root — its own row has no positive
    // ancestor and is deliberately outside every subtree
    val total = graft.Tables.part(spark, dir)
      .filter(col("p_partkey") >= 1)
      .agg(sum(floor(col("p_retailprice") * 100).cast("long")),
        count(lit(1))).collect().head
    // every part with key >= 1 has exactly one ancestor in 1..9, so the
    // nine top-level subtrees partition the table — counts and cents
    // both reconcile
    val top = rows.filter(r => r._1 >= 1 && r._1 <= 9)
    assert(top.map(_._2).sum === total.getLong(1))
    assert(top.map(_._3).sum === total.getLong(0))
  }

  test("x25 recognized revenue reconciles to lineitem cents exactly") {
    val recognized = CrossQueries.queries("x25_revenue_recognition")(spark, dir)
      .agg(sum(col("recognized_cents"))).collect().head.getLong(0)
    val fact = graft.Tables.lineitem(spark, dir)
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")))
      .collect().head.getLong(0)
    assert(recognized === fact, "calendarized ledger != fact table")
  }

  test("s18 PPR: seeds carry at least the final teleport, non-seeds only inflow") {
    val out = SimilarityQueries.queries("s18_ppr")(spark, dir).collect()
    assert(out.nonEmpty)
    var seedMass = 0L; var otherMass = 0L
    out.foreach { r =>
      val (v, m) = (r.getLong(0), r.getLong(1))
      assert(m >= 0L)
      if (v % 97 == 0) { assert(m >= 250000L, s"seed $v mass $m"); seedMass += m }
      else otherMass += m
    }
    assert(seedMass > 0L)
    // 3/4 damping + truncation: total mass can never exceed seeds' worth
    val nSeeds = out.count(_.getLong(0) % 97 == 0)
    assert(seedMass + otherMass <= nSeeds * 2000000L)
  }

  test("s19 k-means members account for every vector; inertia nonnegative") {
    val out = SimilarityQueries.queries("s19_kmeans")(spark, dir).collect()
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(out.map(_.getLong(1)).sum === n)
    assert(out.forall(_.getLong(2) >= 0L))
    assert(out.map(_.getLong(0)).distinct.length === out.length)
  }

  test("q37 drawdown bounds: 0 <= max_drawdown, final_cum <= peak") {
    val rows = RelationalQueries.queries("q37_drawdown")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (peak, dd, fin) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dd >= 0L)
      assert(fin <= peak)
      assert(dd >= peak - fin, "drawdown must cover the final deficit")
    }
  }

  test("v15 Benford ppm shares sum to ~1e6 and counts to the total") {
    val rows = ValidationQueries.queries("v15_benford")(spark, dir).collect()
    assert(rows.length === 9)
    val obsSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    // integer division loses < 1 ppm per digit
    assert(obsSum >= 1000000L - 9 && obsSum <= 1000000L)
    val total = graft.Tables.orders(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
  }

  test("v16 anomaly flag is exactly the integer MAD rule") {
    val rows = ValidationQueries.queries("v16_anomaly_mad")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, med, mad, flag) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(flag === (math.abs(cnt - med) * 10000L > mad * 44478L))
    }
  }

  test("st16 semi join emits exactly the inner join's distinct views") {
    val semi = StreamingQueries.queries("st16_stream_semi_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inner = graft.streaming.Streaming.viewPurchaseJoin(spark, dir)
      .select(col("user_id"), col("view_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(semi === inner, "semi-join view set != inner-join distinct views")
  }

  test("t30 novelty: totals reconcile to corpus-distinct shingles") {
    val rows = TextQueries.queries("t30_ngram_novelty")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sh, nov, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nov >= 0 && nov <= sh)
      assert(ppm === nov * 1000000L / sh)
    }
    // every distinct corpus shingle has exactly one first owner
    val novelSum = rows.map(_.getLong(2)).sum
    val shingleSum = rows.map(_.getLong(1)).sum
    assert(novelSum > 0 && novelSum <= shingleSum)
  }

  test("s20 modularity: degree totals are 2m and Q is bounded") {
    val rows = SimilarityQueries.queries("s20_modularity")(spark, dir).collect()
    val degTotal = rows.map(_.getAs[Long]("deg_sum")).sum
    val eInTotal = rows.map(_.getAs[Long]("e_in")).sum
    // deg_sum counts each undirected edge twice; within-edges at most m
    assert(degTotal % 2 === 0L)
    assert(eInTotal <= degTotal / 2)
    // Q = sum of contributions is in (-1e6, 1e6) by definition
    val q = rows.map(_.getAs[Long]("q_ppm")).sum
    assert(q > -1000000L && q < 1000000L)
  }

  test("x26 A/B readout: conversions subset exposures subset users") {
    val rows = CrossQueries.queries("x26_ab_lift")(spark, dir).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val (users, exp, conv) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(conv <= exp && exp <= users)
      assert(r.getLong(4) === (if (exp > 0) conv * 1000000L / exp else 0L))
    }
  }

  test("q39 quartiles are ordered and the odd-n midpoint matches q26") {
    val rows = RelationalQueries.queries("q39_quartiles")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q1, q2, q3) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(q1 <= q2 && q2 <= q3, s"nation ${r.getInt(0)}: unordered quartiles")
    }
    val medians = RelationalQueries.queries("q26_median_disc")(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (n, q2) = (r.getLong(1), r.getLong(3))
      val (nQ26, med) = medians(r.getInt(0))
      assert(n === nQ26)
      // odd n: the interpolation fraction is 0 and q2 is exactly the
      // lower median in millicents
      if (n % 2 == 1)
        assert(q2 === math.floor(med * 100).toLong * 1000L,
          s"nation ${r.getInt(0)}: q2 $q2 != median $med")
    }
  }

  test("m7 scene accounting: frames from blob length, scenes = cuts + 1") {
    val rows = MultimodalQueries.queries("m7_scene_cuts")(spark, dir).collect()
    assert(rows.nonEmpty)
    val lens = graft.Tables.documents(spark, dir)
      .filter(col("n_chars") % 3 === 2)
      .select(col("doc_id"), length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (id, nf, cuts, scenes) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(nf === (lens(id) + 255) / 256, s"media $id: frame count")
      assert(scenes === (if (nf == 0) 0 else cuts + 1))
      assert(cuts <= math.max(nf - 1, 0))
    }
  }

  test("x27 transition totals = events-in-sessions minus session count") {
    val rows = CrossQueries.queries("x27_event_pathing")(spark, dir).collect()
    val transitions = rows.map(_.getLong(2)).sum
    val nEvents = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull).count()
    val nSessions = StreamingQueries.queries("st2_sessions")(spark, dir)
      .agg(sum(col("n_sessions"))).collect().head.getLong(0)
    // every event except each session's first has exactly one inbound edge
    assert(transitions === nEvents - nSessions)
  }

  test("v17 referential integrity is clean on the generated star schema") {
    val rows = ValidationQueries.queries("v17_ref_integrity")(spark, dir).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getLong(2) === 0L, s"${r.getString(0)}: orphans found")
      assert(r.getLong(1) > 0L)
    }
  }

  test("d15 election agrees with d5's components and picks a max-length member") {
    val d5rows = DedupQueries.queries("d5_dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = DedupQueries.queries("d15_keepbest")(spark, dir).collect()
    assert(kept.map(_.getLong(0)).toSet === d5rows.keySet)
    kept.foreach { r =>
      assert(r.getLong(1) === d5rows(r.getLong(0)), "membership count drifted")
      assert(r.getLong(3) > 0L)
    }
  }

  test("st17 daily rollup equals an independent batch rollup with the cutoff") {
    val out = StreamingQueries.queries("st17_window_chain")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val tsu = graft.streaming.Streaming.tsMicros(col("ts"))
    val e = graft.Tables.events(spark, dir)
      .select(tsu.as("tsu"), col("event_type"))
    val wm = e.agg(max(col("tsu"))).collect().head.getLong(0) - 3600000000L
    val batch = e
      .withColumn("hidx", expr("tsu div 3600000000"))
      .groupBy(col("hidx"), col("event_type")).agg(count(lit(1)).as("n"))
      .withColumn("didx", expr("hidx div 24"))
      .filter((col("didx") + 1) * 86400000000L <= wm)
      .groupBy(col("didx"), col("event_type"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_hours"))
      .select(date_format(timestamp_micros(col("didx") * 86400000000L), "yyyy-MM-dd"),
        col("event_type"), col("n_events"), col("n_hours"))
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === batch)
  }
}
