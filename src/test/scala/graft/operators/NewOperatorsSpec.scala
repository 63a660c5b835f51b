package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables
import graft.functions.TextFunctions
import graft.similarity.Similarity

/** Specs for the round-3 operators: IVF ANN (s7), chunking (t12),
  * document frequency (t13), span dedup (d8).
  */
class NewOperatorsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("IVF with all cells probed reproduces brute force exactly") {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 5)
    // nprobe = 2^bits -> every cell probed -> candidate set == everything
    val ivf = Similarity.topKIvf(e, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 10, bits = 3, nprobe = 8)
      .collect().map(_.toString).sorted.toSeq
    val brute = Similarity.topKBrute(e, "vec_id", "embedding", q, "vec_id", "embedding", k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(ivf === brute)
  }

  test("IVF nprobe=2 keeps high recall against brute force") {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 5)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = hits(Similarity.topKIvf(e, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 10, bits = 3, nprobe = 2))
    val brute = hits(Similarity.topKBrute(e, "vec_id", "embedding", q, "vec_id", "embedding", k = 10))
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@10 $recall")
    // and strictly better coverage than the single-cell path would allow
    assert(ivf.size === brute.size)
  }

  test("embedding clusters: members >= 2, survivor is the component label") {
    val rows = SimilarityQueries.s8(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, "a component only exists from at least one pair")
      assert(r.getLong(2) > r.getLong(0), "max member > component label (min id)")
    }
    // components partition their members: total members == distinct ids in pairs
    val nPairMembers = SimilarityQueries.s3(spark, dir)
      .select(explode(array(col("vec_a"), col("vec_b"))).as("id"))
      .distinct().count()
    assert(rows.map(_.getLong(1)).sum === nPairMembers)
  }

  test("chunking covers every token with the configured window/stride") {
    val chunks = TextQueries.t12(spark, dir)
    val perDoc = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), max(col("n_tokens")).as("max_t"),
        min(col("n_tokens")).as("min_t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc.keySet === toks.keySet)
    perDoc.foreach { case (doc, (nChunks, maxT, minT)) =>
      val n = toks(doc)
      assert(nChunks === (math.max(n, 1) - 1) / 15 + 1, s"doc $doc chunk count")
      assert(maxT <= 20 && minT >= 1, s"doc $doc token bounds")
    }
  }

  test("doc-frequency stats are bounded by corpus size and totally ordered") {
    val rows = TextQueries.t13(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= nDocs))
    val dfs = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(dfs.sameElements(dfs.sortBy { case (d, t) => (-d, t) }), "sorted by df desc, token")
  }

  test("temperature mix: smallest language survives whole, rates flatten monotonically") {
    val rows = TextQueries.t14(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.nonEmpty)
    val minDocs = rows.map(_._2).min
    rows.foreach { case (lang, nDocs, cut, nKept) =>
      assert(nKept <= nDocs)
      if (nDocs == minDocs) assert(nKept === nDocs, s"$lang: smallest language kept whole")
    }
    // bigger language -> smaller hex cut (monotone flattening)
    val sorted = rows.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Seq((_, n1, c1, _), (_, n2, c2, _)) if n1 < n2 => assert(c1 >= c2)
      case _ => ()
    }
  }

  test("FIM spans: prefix and suffix non-empty, spans deterministic") {
    val rows = TextQueries.t15(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = (r.getLong(1), r.getLong(2))
      assert(n >= 6)
      assert(s >= 2 && s <= n - 4, s"doc ${r.getLong(0)}: start $s of $n")
      assert(Set(r.getString(3), r.getString(4), r.getString(5)).forall(_.length == 32))
    }
    val again = TextQueries.t15(spark, dir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("span dedup: duplicate texts score ratio 1.0, ratios in [0,1]") {
    val rows = DedupQueries.d8(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ratio = r.getDouble(3)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getLong(2) <= r.getLong(1), "n_repeated <= n_spans")
    }
    // exact duplicate texts (d1's fingerprint groups with >1 member)
    // must have every span repeated
    val dupDocs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("f"))
      .withColumn("c", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("f"))))
      .filter(col("c") > 1).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    if (dupDocs.nonEmpty) {
      rows.filter(r => dupDocs.contains(r.getLong(0))).foreach { r =>
        assert(r.getDouble(3) === 1.0, s"doc ${r.getLong(0)} is an exact dup")
      }
    }
  }

  test("d10: every d5 cluster contributes exactly one keeper; counts reconcile") {
    val clusters = graft.SparkEntry.queries("d5_dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // component -> n_members
    val kept = graft.SparkEntry.queries("d10_kept_corpus")(spark, dir).collect()
    val canonicals = kept.filter(_.getString(2) == "canonical")
    // one canonical per cluster, removing exactly n_members - 1 dups
    assert(canonicals.length === clusters.size)
    assert(canonicals.map(_.getLong(3)).sorted.toSeq ===
      clusters.values.map(_ - 1).toSeq.sorted)
    // kept = corpus - sum(n_members - 1); uniques removed nothing
    val nDocs = Tables.documents(spark, dir).count()
    assert(kept.length === nDocs - clusters.values.map(_ - 1).sum)
    assert(kept.filter(_.getString(2) == "unique").forall(_.getLong(3) == 0L))
    // the elected keeper really is a member of the cluster it won:
    // every kept doc appears in the corpus exactly once
    assert(kept.map(_.getLong(0)).distinct.length === kept.length)
  }
}
