package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),        // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"),      // near dup of 1
    (4L, "completely different content about spark engines"))
    .toDF("doc_id", "text")

  test("exactDedup keeps the min-id survivor per identical text") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 3L, 4L))
  }

  test("fingerprint normalizes case and whitespace") {
    val fps = Seq("A  b\tC", "a b c").toDF("text")
      .select(TextFunctions.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
  }

  test("minhash: identical docs share full signature; near dups share some") {
    val sig = docs.select(col("doc_id"), Dedup.minhashSigExpr(col("text"), 3, 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sig(1L) === sig(2L))
    val shared13 = sig(1L).zip(sig(3L)).count { case (a, b) => a == b }
    assert(shared13 > 0 && shared13 < 8) // similar but not identical
    val shared14 = sig(1L).zip(sig(4L)).count { case (a, b) => a == b }
    assert(shared14 === 0) // disjoint shingles
  }

  test("LSH candidate pairs find exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: 16-bit string, equal for dups, close for near dups") {
    val sh = docs.select(col("doc_id"),
      Dedup.simhashBits(TextFunctions.tokens(col("text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sh.values.forall(s => s.length == 16 && s.forall(c => c == '0' || c == '1')))
    assert(sh(1L) === sh(2L))
    val hamming13 = sh(1L).zip(sh(3L)).count { case (a, b) => a != b }
    val hamming14 = sh(1L).zip(sh(4L)).count { case (a, b) => a != b }
    assert(hamming13 < hamming14)
  }

  test("jaccard: 1.0 for identical shingle sets, 0.0 for disjoint") {
    val sh = docs.select(col("doc_id"),
      Dedup.wordShingles(TextFunctions.tokens(col("text")), 3).as("sh"))
    val a = sh.select(col("doc_id").as("ia"), col("sh").as("sa"))
    val b = sh.select(col("doc_id").as("ib"), col("sh").as("sb"))
    val jac = a.crossJoin(b)
      .select(col("ia"), col("ib"), Dedup.jaccard(col("sa"), col("sb")).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac((1L, 2L)) === 1.0)
    assert(jac((1L, 4L)) === 0.0)
    assert(jac((1L, 3L)) > 0.0 && jac((1L, 3L)) < 1.0)
  }
}
