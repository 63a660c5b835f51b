package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.similarity.Similarity

/** Invariants for the curation-pipeline gates (t44/t45/s28/s29) that
  * the hash oracles can't articulate: census completeness for the rule
  * suite, funnel monotonicity, SemDeDup's domination contract re-proved
  * through the EXACT cross-multiplied cosine, and the reciprocal-rank
  * arithmetic identity.
  */
class CurationGatesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("t44 rule census: pass_all + any-fail == corpus size") {
    val rows = TextQueries.queries("t44_gopher_rules")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull).count()
    assert(rows.keySet === Set(
      "alpha_ratio", "mean_word_len", "pass_all", "stopwords", "word_count"))
    rows.values.foreach(v => assert(v >= 0L && v <= total))
    // pass_all counts docs failing NO rule; the failure counts overlap,
    // so the only exact identity is against an independently-computed
    // any-fail count
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("long")
    val sumLen = aggregate(
      transform(toks, w => length(w).cast("long")), lit(0L), (a, x) => a + x)
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(array_intersect(
      array_distinct(toks),
      array(Seq("the", "be", "to", "of", "and", "that", "have", "with")
        .map(lit): _*))).cast("long")
    val anyFail = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .filter((nTok < 20L) || (nTok > 100000L) ||
        (sumLen < nTok * 3L) || (sumLen > nTok * 10L) ||
        (nAlpha * 5L < nTok * 4L) || (nStop < 1L))
      .count()
    assert(rows("pass_all") + anyFail === total)
  }

  test("t45 funnel is monotone nonincreasing and starts at the corpus") {
    val stages = TextQueries.queries("t45_pipeline_funnel")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(stages.map(_._1).toSeq === Seq(
      "1_total", "2_quality", "3_lang", "4_exact_dedup", "5_source_cap"))
    val counts = stages.map(_._2)
    counts.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    val total = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull).count()
    assert(counts.head === total)
  }

  test("s28 domination: dropped rows re-prove cos >= 7/20 exactly; kept have no lower-id near-dup in bucket") {
    val res = SimilarityQueries.queries("s28_semdedup")(spark, dir)
    val e = graft.Tables.embeddings(spark, dir)
    val n = e.count()
    assert(res.count() === n)
    val dropped = res.filter(!col("kept"))
    // every dropped row's dominator is a lower id, and the exact
    // 128-bit cross-multiplied threshold holds for the (dom, vec) pair
    val v = e.select(col("vec_id"), Similarity.scaled(col("embedding")).as("sv"))
      .withColumn("nrm", Similarity.dotScaled(col("sv"), col("sv")))
    val pairs = dropped
      .join(v.select(col("vec_id"), col("sv").as("sb"), col("nrm").as("nb")), "vec_id")
      .join(v.select(col("vec_id").as("dom_id"), col("sv").as("sa"),
        col("nrm").as("na")), "dom_id")
      .withColumn("dot", Similarity.dotScaled(col("sa"), col("sb")))
    assert(pairs.filter(col("dom_id") >= col("vec_id")).count() === 0L)
    val dec = "decimal(20,0)"
    val viol = pairs.filter(!(col("dot") > 0L &&
      col("dot").cast(dec) * col("dot").cast(dec) * lit(400) >=
        col("na").cast(dec) * col("nb").cast(dec) * lit(49))).count()
    assert(viol === 0L, "a dropped vector's dominator pair fails the exact threshold")
    // kept ∪ dropped partitions the id space
    assert(res.filter(col("kept")).count() + dropped.count() === n)
  }

  test("s29 reciprocal-rank identity and rank sanity") {
    val rows = SimilarityQueries.queries("s29_mrr")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    rows.foreach { r =>
      val rank = r.getAs[Long]("first_rank")
      assert(rank >= 1L)
      assert(r.getAs[Long]("rr_ppm") === 1000000L / rank)
    }
  }
}
