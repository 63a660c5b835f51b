package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The load-bearing claim of d25_maximal_spans — that corpus-wide
  * duplicated-shingle marking + gaps-and-islands coalescing rebuilds the
  * EXACT maximal duplicated span a suffix array would report (Lee et
  * al. 2022's pass), which the grid-aligned d8/d13 cannot: a shared
  * region of L tokens at ARBITRARY offset must come back as one span of
  * exactly L, regardless of alignment to any stride. Runs against a
  * synthetic corpus so the span lengths and offsets are chosen, not
  * sampled.
  */
class MaximalSpansSpec extends SparkSpec {

  private def corpusDir(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("d25spec").toString
    import spark.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def uniq(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a shared L-token run at unaligned offsets comes back as one span of exactly L") {
    // 17-token shared run, planted at token offset 3 in doc 1 and offset
    // 8 in doc 2 — both misaligned to every stride-10 grid cell.
    val shared = (0 until 17).map(i => s"dup$i").mkString(" ")
    val dir = corpusDir(Seq(
      1L -> s"${uniq("a", 3)} $shared ${uniq("b", 15)}",
      2L -> s"${uniq("c", 8)} $shared ${uniq("d", 12)}"))
    val rows = graft.operators.DedupQueries.queries("d25_maximal_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // one maximal span per doc, dup_tokens == max_span == 17: the
    // 17 − 10 + 1 = 8 consecutive duplicated starts coalesce to [s, s+17)
    assert(rows.toSeq === Seq((1L, 1L, 17L, 17L), (2L, 1L, 17L, 17L)))
  }

  test("two separated shared runs stay two islands; docs under 10 tokens are out of scope") {
    val runA = (0 until 10).map(i => s"x$i").mkString(" ")
    val runB = (0 until 12).map(i => s"y$i").mkString(" ")
    val dir = corpusDir(Seq(
      1L -> s"$runA ${uniq("gap", 11)} $runB",
      2L -> s"$runA ${uniq("pad", 14)} $runB",
      3L -> "too short to shingle"))
    val rows = graft.operators.DedupQueries.queries("d25_maximal_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // gap of 11 unique tokens > k−1 keeps the islands apart: 2 spans,
    // 10 + 12 = 22 duplicated tokens, max 12; the 4-token doc is absent
    assert(rows.toSeq === Seq((1L, 2L, 22L, 12L), (2L, 2L, 22L, 12L)))
  }

  test("within-document repetition is duplication too (suffix-array semantics)") {
    val run = (0 until 10).map(i => s"r$i").mkString(" ")
    val dir = corpusDir(Seq(
      1L -> s"$run ${uniq("mid", 12)} $run",
      2L -> uniq("z", 40)))
    val rows = graft.operators.DedupQueries.queries("d25_maximal_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the run repeats inside doc 1 alone → both occurrences flagged;
    // doc 2 has no duplication anywhere and must not appear
    assert(rows.toSeq === Seq((1L, 2L, 20L, 10L)))
  }
}
