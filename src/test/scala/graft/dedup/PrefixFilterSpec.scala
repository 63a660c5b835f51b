package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Losslessness + boundary contract for d26_prefix_filter (AllPairs /
  * PPJoin prefix filtering at Jaccard ≥ 19/20). The oracle gate is
  * brute force by construction; this spec re-proves the same property
  * on corpora CHOSEN to stress the filter: exact-boundary pairs,
  * just-below pairs, duplicate docs, and a randomized corpus compared
  * against an in-Spark brute-force join.
  */
class PrefixFilterSpec extends SparkSpec {

  private def corpusDir(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("d26spec").toString
    import spark.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String) =
    graft.operators.DedupQueries.queries("d26_prefix_filter")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("boundary pairs: J = 19/20 included, J = 19/21 excluded, exact dup at 1.0") {
    val base = (1 to 20).map(i => s"w$i")
    val dir = corpusDir(Seq(
      1L -> base.mkString(" "),                       // 20 tokens
      2L -> base.drop(1).mkString(" "),               // 19 shared / 20 union = .95
      3L -> (base.drop(1) :+ "zz").mkString(" "),     // 19 shared / 21 union = .904…
      4L -> base.mkString(" ")))                      // exact dup of 1
    val got = run(dir)
    // 1–3 (and 3–4) sit at 19/21 = .904… and must be EXCLUDED; 2–3 is
    // 19/20 (19-token doc inside the 20-token doc) and included
    assert(got === Seq(
      (1L, 2L, 950000L), (1L, 4L, 1000000L),
      (2L, 3L, 950000L), (2L, 4L, 950000L)))
  }

  test("losslessness on a randomized near-dup corpus vs in-Spark brute force") {
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 120).map(i => s"tok$i")
    // 40 docs in near-dup families: each family mutates 0–2 tokens of a
    // 30-token base, which lands pairs on both sides of the threshold
    val docs = (0 until 40).map { i =>
      val fam = i / 4
      val famRnd = new scala.util.Random(fam)
      val base = famRnd.shuffle(vocab).take(30)
      val mut = rnd.nextInt(3)
      val txt = (base.drop(mut) ++ (1 to mut).map(m => s"u${i}_$m")).mkString(" ")
      (i.toLong, txt)
    }
    val dir = corpusDir(docs)
    val got = run(dir)
    // brute force, independently of the operator's machinery
    val t = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val brute = t.as("a").join(t.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.toks"), col("b.toks"))).cast("long").as("inter"),
        (size(col("a.toks")) + size(col("b.toks"))).cast("long").as("szsum"))
      .withColumn("uni", col("szsum") - col("inter"))
      .filter(col("inter") * 20 >= col("uni") * 19)
      .select(col("doc_a"), col("doc_b"), expr("inter * 1000000 div uni").as("jac_ppm"))
      .orderBy(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(brute.nonEmpty, "corpus must actually produce matching pairs")
    assert(got === brute)
  }
}
