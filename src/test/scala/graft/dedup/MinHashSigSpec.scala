package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("expression signature is byte-identical to the explode+aggregate plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val viaAgg = Dedup.minhashSignatures(docs, "doc_id", "text", shingleN = 3, k = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaExpr = docs.select($"doc_id", Dedup.minhashSigExpr($"text").as("_sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaExpr.keySet === viaAgg.keySet)
    viaExpr.foreach { case (id, sig) => assert(sig === viaAgg(id), s"doc $id") }
  }

  test("expression stays inside whole-stage codegen; empty input yields null") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs.select(Dedup.minhashSigExpr($"text").as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("minhash_sig") && l.trim.startsWith("*(")), plan)

    // fewer tokens than the shingle width → null signature (no shingles)
    val short = Seq("only two").toDF("text")
      .select(Dedup.minhashSigExpr($"text", shingleN = 3).as("s")).head()
    assert(short.isNullAt(0))
    val exact = Seq("just three tokens").toDF("text")
      .select(Dedup.minhashSigExpr($"text", shingleN = 3).as("s")).head()
    assert(!exact.isNullAt(0))
  }

  test("streaming near-dup banding: exact dup loses all its band keys to the original") {
    // batch emulation of the streaming primitive: first-owner per band
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different text about spark plans here"))
      .toDF("doc_id", "text")
    val sig = docs.select($"doc_id", Dedup.minhashSigExpr($"text").as("_sig"))
    val banded = sig.select($"doc_id",
      explode(Dedup.lshBandKeys($"_sig", 4, 2)).as("band"))
    val owners = banded.groupBy($"band").agg(min($"doc_id").as("owner"))
    val survivors = banded.join(owners, "band")
      .groupBy($"doc_id")
      .agg(sum(when($"doc_id" === $"owner", 1).otherwise(0)).as("owned"))
    val owned = survivors.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(owned(1L) === 4L) // original owns all bands
    assert(owned(2L) === 0L) // exact dup owns none → dropped
    assert(owned(3L) === 4L)
  }
}
