package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the property content-defined chunking exists for: boundaries
  * derive from content, so an insertion at the head of a document
  * shifts every FIXED chunk frame but CDC boundaries re-synchronize
  * within one window — the two versions still share most chunks.
  */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  /** d12's chunker on an arbitrary (source, text) frame. */
  private def chunkHashes(rows: Seq[(String, String)]): Map[String, Set[String]] = {
    val cw = 16
    rows.toDF("source", "text")
      .withColumn("bnd", expr(
        s"""CASE WHEN length(text) < $cw THEN CAST(array() AS ARRAY<INT>)
           |ELSE filter(transform(sequence($cw, length(text)), i ->
           |  CASE WHEN substring(md5(substring(text, i - ${cw - 1}, $cw)), 32, 1)
           |       IN ('0', '1') THEN i END), x -> x IS NOT NULL) END""".stripMargin))
      .withColumn("bs", expr("concat(array(0), bnd, array(length(text)))"))
      .select(col("source"), explode(expr(
        """transform(sequence(1, size(bs) - 1), j ->
          |  substring(text, element_at(bs, j) + 1,
          |            element_at(bs, j + 1) - element_at(bs, j)))""".stripMargin)).as("chunk"))
      .filter(length(col("chunk")) > 0)
      .select(col("source"), md5(col("chunk")).as("h"))
      .collect().groupBy(_.getString(0)).map { case (s, rs) => s -> rs.map(_.getString(1)).toSet }
  }

  test("an inserted prefix leaves most CDC chunks shared; fixed frames share none") {
    val base = (1 to 40).map(i => s"sentence number $i carries some shared corpus content.").mkString(" ")
    val shifted = "INSERTED HEADER OF ODD LENGTH 37! " + base
    val hashes = chunkHashes(Seq("a" -> base, "b" -> shifted))
    val overlap = hashes("a").intersect(hashes("b")).size.toDouble / hashes("a").size
    assert(overlap > 0.8, s"CDC chunks should re-sync after the insertion; overlap=$overlap")

    // fixed-width frames of the same size share nothing after the shift
    val w = 64
    def fixed(t: String): Set[String] = t.grouped(w).toSet
    val fixedOverlap = fixed(base).intersect(fixed(shifted)).size
    assert(fixedOverlap === 0, "the shift defeats fixed framing — that contrast is the point")
  }

  test("chunks reassemble exactly to the document (no loss, no overlap)") {
    val text = (1 to 30).map(i => s"block $i with content").mkString(" ")
    val cw = 16
    val chunks = Seq("x" -> text).toDF("source", "text")
      .withColumn("bnd", expr(
        s"""CASE WHEN length(text) < $cw THEN CAST(array() AS ARRAY<INT>)
           |ELSE filter(transform(sequence($cw, length(text)), i ->
           |  CASE WHEN substring(md5(substring(text, i - ${cw - 1}, $cw)), 32, 1)
           |       IN ('0', '1') THEN i END), x -> x IS NOT NULL) END""".stripMargin))
      .withColumn("bs", expr("concat(array(0), bnd, array(length(text)))"))
      .select(explode(expr(
        """transform(sequence(1, size(bs) - 1), j ->
          |  substring(text, element_at(bs, j) + 1,
          |            element_at(bs, j + 1) - element_at(bs, j)))""".stripMargin)).as("chunk"))
      .filter(length(col("chunk")) > 0)
      .collect().map(_.getString(0))
    assert(chunks.mkString("") === text)
  }

  test("short documents (< window) come through as one chunk") {
    val hashes = chunkHashes(Seq("s" -> "tiny doc"))
    assert(hashes("s").size === 1)
  }
}
