package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables
import graft.functions.TextFunctions

/** Specs for the round-3 additions: PMI collocations (t16), SCD2
  * gaps-and-islands history (x7), winnowing fingerprints (d9).
  */
class Round3cOperatorsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // -------------------------------------------------------------------
  // t16_pmi_bigrams

  test("t16 PMI scores match an independent BigInt recomputation") {
    val docs = Tables.documents(spark, dir)
      .select(col("text")).filter(col("text").isNotNull)
      .as[String].collect().map(_.split(" ", -1).toSeq)
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val big = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    docs.foreach { t =>
      t.foreach(w => uni(w) += 1)
      t.sliding(2).foreach { case Seq(a, b) => big((a, b)) += 1; case _ => }
    }
    val nu = BigInt(uni.values.sum)
    val nb = BigInt(big.values.sum)
    val expected = big.iterator.filter(_._2 >= 5).map { case ((a, b), cxy) =>
      val ppm = (BigInt(cxy) * nu * nu * 1000000) / (BigInt(uni(a)) * BigInt(uni(b)) * nb)
      ((a, b), (cxy, uni(a), uni(b), ppm.toLong))
    }.toMap
    val rows = TextQueries.t16(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val got = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(expected(key) === got, s"bigram $key")
    }
    // result is the global top-k: every returned score >= every omitted one
    if (expected.size > rows.length) {
      val returned = rows.map(r => (r.getString(0), r.getString(1))).toSet
      val minKept = rows.map(_.getLong(5)).min
      val maxOmitted = expected.collect {
        case (k, (_, _, _, p)) if !returned(k) => p }.max
      assert(minKept >= maxOmitted)
    }
    // sorted by (pmi desc, w1, w2)
    val keys = rows.map(r => (-r.getLong(5), r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted))
  }

  test("t16 counts are mutually consistent") {
    TextQueries.t16(spark, dir).collect().foreach { r =>
      val (cxy, cx, cy) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cxy >= 5 && cx >= cxy && cy >= cxy)
      assert(r.getLong(5) >= 0)
    }
  }

  // -------------------------------------------------------------------
  // x7_scd2_history

  test("x7 islands partition the orders table and alternate status") {
    val rows = CrossQueries.x7(spark, dir).collect()
    val nOrders = Tables.orders(spark, dir).count()
    assert(rows.map(_.getLong(5)).sum === nOrders, "every order lands in exactly one run")
    rows.groupBy(_.getLong(0)).foreach { case (cust, runs) =>
      val sorted = runs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).sameElements(1L to sorted.length), s"cust $cust run_idx contiguous")
      // NTZ parquet timestamps arrive as LocalDateTime; ISO order == time order
      def t(r: org.apache.spark.sql.Row, i: Int) = r.getAs[Any](i).toString
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(2) != b.getString(2), s"cust $cust adjacent runs must differ")
          assert(t(a, 4) <= t(b, 3), s"cust $cust runs ordered in time")
        case _ =>
      }
      assert(sorted.count(_.getBoolean(7)) === 1, s"cust $cust exactly one current run")
      assert(sorted.last.getBoolean(7), s"cust $cust current is the last run")
      sorted.foreach(r => assert(t(r, 3) <= t(r, 4), "eff_from <= eff_to"))
    }
  }

  test("x7 collapses a hand-built change sequence correctly") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val df = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "A", 10.0),
      (1L, 11L, ts("2024-01-02 00:00:00"), "A", 20.0),
      (1L, 12L, ts("2024-01-03 00:00:00"), "B", 30.0),
      (1L, 13L, ts("2024-01-04 00:00:00"), "A", 40.0),
      (2L, 20L, ts("2024-01-01 00:00:00"), "Z", 5.0))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice")
    val tmp = java.nio.file.Files.createTempDirectory("x7spec").toString
    df.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = CrossQueries.x7(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(5), r.getDouble(6), r.getBoolean(7)))
    assert(out.toSeq === Seq(
      (1L, 1L, "A", 2L, 30.0, false),
      (1L, 2L, "B", 1L, 30.0, false),
      (1L, 3L, "A", 1L, 40.0, true),
      (2L, 1L, "Z", 1L, 5.0, true)))
  }

  // -------------------------------------------------------------------
  // d9_winnowing

  private def fpsOf(texts: Seq[(Long, String)]) =
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(DedupQueries.winnowFps(col("toks"))).as("fp"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap

  test("winnow_fps kernel == declarative HOF formulation on the corpus") {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(col("toks").isNotNull && size(col("toks")) >= 8)
    def sets(c: org.apache.spark.sql.Column) =
      base.select(col("doc_id"), array_sort(c).as("fps"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val kernel = sets(DedupQueries.winnowFps(col("toks")))
    val hof = sets(DedupQueries.winnowFpsDeclarative)
    assert(kernel.keySet === hof.keySet)
    kernel.foreach { case (id, fps) => assert(fps === hof(id), s"doc $id") }
  }

  test("winnow_fps kernel == declarative HOF on arrays containing nulls") {
    // array_join skips a null element AND its separator; the kernel must
    // digest the identical joined string (not leave a doubled space).
    val withNulls = Seq(
      Seq[String]("a", null, "b", "c", "d", "e", "f", "g", "h"),
      Seq[String](null, "a", "b", "c", "d", "e", "f", "g"),
      Seq[String]("a", "b", "c", "d", "e", "f", "g", null))
      .toDF("toks")
    val r = withNulls.select(
      array_sort(DedupQueries.winnowFps(col("toks"))).as("kernel"),
      array_sort(DedupQueries.winnowFpsDeclarative).as("hof")).collect()
    r.foreach { row =>
      assert(row.getSeq[String](0) === row.getSeq[String](1))
    }
  }

  test("winnow_fps is null below k+w-1 tokens, single-window at exactly 8") {
    val r = Seq(("a b c d e f g", "a b c d e f g h")).toDF("short_doc", "exact_doc")
      .select(
        DedupQueries.winnowFps(TextFunctions.tokens(col("short_doc"))).as("s"),
        DedupQueries.winnowFps(TextFunctions.tokens(col("exact_doc"))).as("e"))
      .head()
    assert(r.isNullAt(0), "7 tokens -> 4 shingles -> no 4-window")
    assert(r.getSeq[String](1).size === 1, "8 tokens -> exactly one window")
  }

  test("winnowing guarantee: docs sharing an 8-token run share a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val fps = fpsOf(Seq(
      (1L, s"one two $shared three four"),
      (2L, s"x1 x2 x3 x4 $shared y1 y2")))
    assert((fps(1L) & fps(2L)).nonEmpty, "k+w-1 shared tokens must collide")
  }

  test("winnowing: disjoint-vocabulary docs share nothing; density bounds hold") {
    val fps = fpsOf(Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "k l m n o p q r s t")))
    assert((fps(1L) & fps(2L)).isEmpty)
    // n=10 tokens -> 6 shingles -> 3 windows -> between 1 and 3 fingerprints
    fps.values.foreach(s => assert(s.nonEmpty && s.size <= 3))
  }

  // -------------------------------------------------------------------
  // s9_pq_codes

  test("s9 PQ codes and error match an independent argmin recomputation") {
    import graft.similarity.Similarity
    val e = Tables.embeddings(spark, dir)
    val trained = Similarity.pqTrain(e, "embedding", m = 4, subDim = 16)
    assert(trained.nonEmpty && trained.size <= 16)
    trained.foreach { case (sub, cell, cent, cn2) =>
      assert(sub >= 0 && sub < 4 && cell >= 0 && cell < 4)
      assert(cent.size === 16 && cn2 === cent.map(x => x * x).sum)
    }
    val bySub = trained.groupBy(_._1)
    val scaledVecs = e.select(col("vec_id"),
      Similarity.scaled(col("embedding")).as("sv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = SimilarityQueries.s9(spark, dir).collect()
    assert(got.length === scaledVecs.size)
    got.foreach { r =>
      val sv = scaledVecs(r.getLong(0))
      var err = 0L
      (0 until 4).foreach { s =>
        val subv = sv.slice(s * 16, s * 16 + 16)
        val (bestCell, bestDist) = bySub(s).map { case (_, cell, cent, _) =>
          (cell, subv.zip(cent).map { case (x, c) => (x - c) * (x - c) }.sum)
        }.minBy { case (cell, dist) => (dist, cell) }
        assert(r.getInt(1 + s) === bestCell, s"vec ${r.getLong(0)} sub $s")
        err += bestDist
      }
      assert(r.getLong(5) === err, s"vec ${r.getLong(0)} err_sq")
    }
  }

  // -------------------------------------------------------------------
  // q20_grouping_sets

  test("q20 marginals equal direct groupBys; grand total covers the table") {
    val rows = RelationalQueries.q20(spark, dir).collect()
    val orders = Tables.orders(spark, dir)
    val byStatus = orders.groupBy(col("o_orderstatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byPrio = orders.groupBy(col("o_orderpriority")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = orders.count()
    // gid 1 = (status) set, 2 = (priority) set, 3 = grand total
    val g1 = rows.filter(_.getLong(2) == 1L)
    val g2 = rows.filter(_.getLong(2) == 2L)
    val g3 = rows.filter(_.getLong(2) == 3L)
    assert(rows.length === g1.length + g2.length + g3.length, "only the three declared sets")
    assert(g1.map(r => r.getString(0) -> r.getLong(3)).toMap === byStatus)
    assert(g1.forall(_.getString(1) == "ALL"))
    assert(g2.map(r => r.getString(1) -> r.getLong(3)).toMap === byPrio)
    assert(g2.forall(_.getString(0) == "ALL"))
    assert(g3.map(_.getLong(3)).toSeq === Seq(n))
  }

  test("d9 groups are real collisions on the corpus") {
    val rows = DedupQueries.d9(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2)
      assert(r.getLong(2) < r.getLong(3), "distinct docs -> min_doc < max_doc")
    }
  }
}
