package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables

/** Specs for the round-4 additions: Bloom-pruned join (x8), incremental
  * SCD2 merge (x9), CMS heavy hitters (sk3), k-NN graph (s10), BPE pair
  * counting (t17).
  */
class Round4OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // -------------------------------------------------------------------
  // x8_bloom_join

  test("x8 equals the plain join (Bloom prune is result-transparent)") {
    val plain = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
        .filter(year(col("o_orderdate")) === 1998 && col("o_totalprice") > 150000.0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        RelationalQueries.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
      .collect().map(_.toString).toSeq
    val bloomed = CrossQueries.x8(spark, dir).collect().map(_.toString).toSeq
    assert(bloomed === plain)
    assert(bloomed.nonEmpty)
  }

  test("x8 plan: might_contain prefilters the probe side below the join") {
    val plan = CrossQueries.x8(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    // the prune must sit in the scan-side filter, i.e. appear together
    // with the lineitem scan, not above the join
    val joinIdx = plan.indexOf("Join")
    val mcIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && mcIdx > joinIdx,
      "might_contain should be below (printed after) the join operator")
  }

  // -------------------------------------------------------------------
  // x9_scd2_merge

  test("x9 incremental merge equals the x7 full rebuild") {
    val rebuild = CrossQueries.x7(spark, dir).collect().map(_.toString).toSeq
    val merged = CrossQueries.x9(spark, dir).collect().map(_.toString).toSeq
    assert(merged === rebuild)
    assert(merged.nonEmpty)
  }

  test("x9 exercises the absorb and break merge paths at gate scale") {
    // the equality test is only meaningful if the data actually contains
    // customers that (a) continue their status across the 1998/1999
    // boundary (absorb) and (b) change status at it (new interval)
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderstatus"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val marked = o
      .withColumn("era", when(year(col("o_orderdate")) <= 1998, 0).otherwise(1))
      .withColumn("prev_era", lag(col("era"), 1).over(w))
      .withColumn("prev_status", lag(col("o_orderstatus"), 1).over(w))
      .filter(col("era") === 1 && col("prev_era") === 0)
    val absorb = marked.filter(col("o_orderstatus") === col("prev_status")).count()
    val break = marked.filter(col("o_orderstatus") =!= col("prev_status")).count()
    assert(absorb > 0, "no boundary-continuing customer in the data")
    assert(break > 0, "no boundary-changing customer in the data")
  }

  test("x9 merge == rebuild on synthetic data covering every path") {
    // gate data has no customer whose FIRST order is in the batch era, so
    // that path (old_max null → islands numbered from 1) gets a synthetic
    // table: absorb (cust 1), break (cust 2), old-only (cust 3),
    // batch-only (cust 4), batch-only with an in-batch change (cust 5)
    val tmp = java.nio.file.Files.createTempDirectory("x9_synth").toString
    Seq(
      (1L, 10L, "1998-03-01", "O", 10.50), (1L, 11L, "1999-02-01", "O", 20.25),
      (2L, 20L, "1998-05-01", "O", 30.00), (2L, 21L, "1999-03-01", "F", 40.00),
      (3L, 30L, "1997-01-01", "F", 50.00), (3L, 31L, "1998-01-01", "O", 60.00),
      (4L, 40L, "1999-06-01", "O", 70.00),
      (5L, 50L, "1999-07-01", "O", 80.00), (5L, 51L, "2000-01-01", "F", 90.00))
      .toDF("o_custkey", "o_orderkey", "d", "o_orderstatus", "o_totalprice")
      .select(col("o_custkey"), col("o_orderkey"),
        to_timestamp(col("d")).as("o_orderdate"),
        col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val rebuild = CrossQueries.x7(spark, tmp).collect().map(_.toString).toSeq
    val merged = CrossQueries.x9(spark, tmp).collect().map(_.toString).toSeq
    assert(merged === rebuild)
    // sanity on the synthetic shape itself: cust 1 collapses to one
    // interval, cust 2 to two, cust 5's batch-only history has two
    assert(merged.count(_.startsWith("[1,")) === 1)
    assert(merged.count(_.startsWith("[2,")) === 2)
    assert(merged.count(_.startsWith("[5,")) === 2)
  }

  // -------------------------------------------------------------------
  // d11_dedup_merge

  test("d11 incremental admission == full rebuild on a fixture with every path") {
    // gate data has almost no exact duplicates, so the reject path gets
    // a synthetic corpus: cross-era dup (doc 401 rejected), in-batch dup
    // (410 kept, 411 rejected), existing-only dup (2 kept, 3 rejected),
    // unique batch doc (420 admitted), null-text in both eras (keeper 5,
    // batch 430 rejected)
    val tmp = java.nio.file.Files.createTempDirectory("d11_synth").toString
    Seq[(Long, Option[String], String)](
      (1L, Some("alpha beta"), "s0"), (2L, Some("gamma"), "s0"),
      (3L, Some("gamma"), "s1"), (5L, None, "s1"),
      (401L, Some("alpha  beta"), "s1"),   // whitespace-normalized dup of 1
      (410L, Some("delta"), "s0"), (411L, Some("delta"), "s1"),
      (420L, Some("epsilon"), "s1"), (430L, None, "s0"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = DedupQueries.d11(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got === Seq((1L, "existing"), (2L, "existing"), (5L, "existing"),
      (410L, "admitted"), (420L, "admitted")))
    // and on the gate dir the roster equals a Spark-side full rebuild
    val fp = Tables.documents(spark, dir).select(col("doc_id"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("f"))
    val rebuild = fp.groupBy(col("f")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    val inc = DedupQueries.d11(spark, dir).select(col("doc_id"))
      .as[Long].collect().sorted.toSeq
    assert(inc === rebuild)
  }

  // -------------------------------------------------------------------
  // x11_gapfill

  test("x11 grid is dense, zeros fill real gaps, rolling sums recompute") {
    val rows = CrossQueries.x11(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val types = rows.map(_._2).distinct.sorted
    val hours = rows.map(_._1).distinct.sorted
    // dense grid: every (hour, type) cell present exactly once
    assert(rows.length === types.length * hours.length)
    assert(hours === (hours.head to hours.last).toSeq, "hour axis has holes")
    // the fill is exercised: some cells are genuine zeros
    assert(rows.exists(_._3 == 0L), "no gap to fill — fixture degenerate")
    // trailing 3-row sum recomputed independently per type
    types.foreach { t =>
      val series = rows.filter(_._2 == t).sortBy(_._1)
      series.zipWithIndex.foreach { case ((_, _, _, sum3), i) =>
        val expect = series.slice(math.max(0, i - 2), i + 1).map(_._3).sum
        assert(sum3 === expect, s"type=$t idx=$i")
      }
    }
  }

  // -------------------------------------------------------------------
  // v7_orc_roundtrip

  test("v7: ORC read-back pushes filters and prunes partitions") {
    val docs = Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("orc_pushdown").toString
    docs.write.mode("overwrite").partitionBy("source").orc(tmp)
    val q = spark.read.orc(tmp)
      .filter(col("source") === "src1" && col("n_chars") > 100)
      .select(col("doc_id"), col("n_chars"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"), plan)
    // the partition filter prunes directories, it is not a data filter
    assert(plan.contains("PartitionFilters"), plan)
    assert(q.count() === docs.filter(col("source") === "src1" && col("n_chars") > 100).count())
  }

  // -------------------------------------------------------------------
  // sk3_heavy_hitters

  test("sk3 anchors the exact top-20 and every CMS bound holds") {
    val rows = SketchQueries.sk3(spark, dir).collect()
    assert(rows.length === 20)
    // cms_ok pinned TRUE for every row (the oracle's contract)
    assert(rows.forall(_.getBoolean(2)))
    // anchors equal an independent exact count
    val exact = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq === exact)
  }

  // -------------------------------------------------------------------
  // s10_knn_graph

  test("s10 TopK-aggregator graph equals the window-rank formulation") {
    val viaAgg = SimilarityQueries.s10(spark, dir)
      .collect().map(_.toString).toSeq
    // independent formulation: same candidates, row_number window
    val e = Tables.embeddings(spark, dir)
    val v = e.select(col("vec_id"),
      graft.similarity.Similarity.scaled(col("embedding")).as("sv"),
      graft.similarity.Similarity.signBucket(col("embedding"), 3).as("bucket"))
      .withColumn("nrm", graft.similarity.Similarity.dotScaled(col("sv"), col("sv")))
    val a = v.select(col("vec_id").as("vec_a"), col("sv").as("sa"),
      col("nrm").as("na"), col("bucket"))
    val b = v.select(col("vec_id").as("vec_b"), col("sv").as("sb"),
      col("nrm").as("nb"), col("bucket"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_a")).orderBy(col("cos").desc, col("vec_b"))
    val viaWindow = a.join(b, Seq("bucket"))
      .filter(col("vec_a") =!= col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(graft.similarity.Similarity.cosineWithNorms(
          graft.similarity.Similarity.dotScaled(col("sa"), col("sb")),
          col("na"), col("nb")), 6).as("cos"))
      .withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("vec_a").as("vec_id"), col("rnk"),
        col("vec_b").as("nbr_id"), col("cos"))
      .orderBy(col("vec_id"), col("rnk"))
      .collect().map(_.toString).toSeq
    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  // -------------------------------------------------------------------
  // s11_label_prop

  test("s11 majority vote matches an independent recomputation from s10's graph") {
    val edges = SimilarityQueries.s10(spark, dir)
      .select(col("vec_id"), col("nbr_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val expected = labels.map { case (v, own) =>
      val nbrLabels = edges.filter(_._1 == v).map(e => labels(e._2))
      if (nbrLabels.isEmpty) v -> ((own, 0L))
      else {
        val byLabel = nbrLabels.groupBy(identity).view.mapValues(_.length.toLong)
        // majority: count desc, label asc
        val (winner, votes) = byLabel.toSeq.minBy { case (l, c) => (-c, l) }
        v -> ((winner, votes))
      }
    }
    val got = SimilarityQueries.s11(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3)))).toMap
    assert(got === expected)
    // the round is non-trivial: at least one vector flips label
    val flips = SimilarityQueries.s11(spark, dir)
      .filter(col("old_label") =!= col("new_label")).count()
    assert(flips > 0, "label propagation is a no-op on this data")
  }

  // -------------------------------------------------------------------
  // q21_rolling_window

  test("q21 RANGE frame equals the naive range self-join") {
    val viaWindow = RelationalQueries.q21(spark, dir)
      .collect().map(_.toString).toSeq
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).cast("long").as("day"),
        col("o_totalprice"))
    val p = o.select(col("o_custkey").as("ck"), col("day").as("pday"),
      col("o_totalprice").as("pprice"))
    val viaJoin = o.join(p,
        col("o_custkey") === col("ck") &&
          col("pday") >= col("day") - 29 && col("pday") <= col("day"))
      .groupBy(col("o_custkey"), col("o_orderkey"), col("day"), col("o_totalprice"))
      .agg(RelationalQueries.dsum(col("pprice")).as("spend_30d"),
        count(lit(1)).as("n_30d"))
      .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
      .collect().map(_.toString).toSeq
    assert(viaWindow === viaJoin)
    assert(viaWindow.nonEmpty)
  }

  test("q21's RANGE frame is exercised: same-day same-customer peers exist") {
    // with no same-day peers a ROWS frame would coincidentally agree;
    // this guards the test data keeps the distinguishing case
    val dupDays = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate").cast("date"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(dupDays > 0, "no same-day peers — RANGE vs ROWS is untested")
  }

  // -------------------------------------------------------------------
  // t18_leakage_split

  test("t18: every near-dup cluster lands in exactly one split; naive split leaks") {
    val docs = Tables.documents(spark, dir)
    val pairs = graft.dedup.Dedup.minhashCandidatePairs(
      docs, "doc_id", "text", shingleN = 3, k = 8, bands = 4)
    val comp = graft.dedup.ConnectedComponents
      .connectedComponents(pairs, "doc_a", "doc_b")
      .withColumnRenamed("id", "doc_id")
    def splitOf(key: org.apache.spark.sql.Column) = {
      val b = substring(md5(key), 1, 2)
      when(b < lit("cc"), lit("train")).when(b < lit("e6"), lit("val"))
        .otherwise(lit("test"))
    }
    // group-keyed split: one split per component
    val grouped = comp
      .withColumn("split", splitOf(concat(lit("grp:"), col("component").cast("string"))))
      .groupBy(col("component"))
      .agg(countDistinct(col("split")).as("n_splits"))
    assert(grouped.filter(col("n_splits") =!= 1).count() === 0)
    // the doc-keyed (t6-style) split must actually leak on this data,
    // otherwise the cluster-aware op is vacuous
    val leaked = comp
      .withColumn("split", splitOf(col("doc_id").cast("string")))
      .groupBy(col("component"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(leaked > 0, "doc-keyed split does not leak — data too small to test")
    // totals reconcile with the corpus
    val out = TextQueries.t18(spark, dir).collect()
    assert(out.map(_.getLong(1)).sum === docs.count())
  }

  // -------------------------------------------------------------------
  // t19_df_score

  test("t19 mean-DF scores match an independent BigInt recomputation") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).filter(col("text").isNotNull)
      .as[(Long, String)].collect()
    val dfMap = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (_, text) =>
      text.split(" ", -1).distinct.foreach(t => dfMap(t) += 1)
    }
    val nDocs = docs.length.toLong
    val buckets = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    docs.foreach { case (_, text) =>
      val toks = text.split(" ", -1)
      val sumDf = toks.map(t => BigInt(dfMap(t))).sum
      val bp = (sumDf * 10000 / (BigInt(toks.length) * nDocs)).toLong
      buckets(bp / 250) += 1
    }
    val got = TextQueries.t19(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === buckets.toMap)
    assert(got.size > 1, "degenerate histogram — one bucket only")
  }

  // -------------------------------------------------------------------
  // t17_bpe_pairs

  test("t17 pair counts match a naive recomputation") {
    val docs = Tables.documents(spark, dir)
      .select(col("text")).filter(col("text").isNotNull)
      .as[String].collect()
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { text =>
      text.split(" ", -1).foreach { t =>
        if (t.length >= 2)
          (0 until t.length - 1).foreach(i => counts(t.substring(i, i + 2)) += 1)
      }
    }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)
    val got = TextQueries.t17(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }
}
