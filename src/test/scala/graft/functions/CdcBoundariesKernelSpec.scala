package graft.functions

import graft.SparkSpec
import graft.operators.DedupQueries
import org.apache.spark.sql.functions._

/** Equivalence witness for the [[graft.functions.expressions.CdcBoundaries]]
  * kernel: the fused byte-walk must reproduce the declarative HOF
  * formulation exactly — on the REAL document corpus (multilingual,
  * CJK included — character indexing must match Spark's substring
  * semantics) and on adversarial edges (shorter than one window,
  * exactly one window, empty string, multi-byte-only text).
  */
class CdcBoundariesKernelSpec extends SparkSpec {

  test("kernel equals the declarative HOF on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val both = docs
      .withColumn("k", DedupQueries.cdcBoundaries(col("text")))
      .withColumn("d", DedupQueries.cdcBoundariesDeclarative)
    val diff = both.filter(not(col("k") <=> col("d"))).count()
    assert(diff == 0)
    // the corpus must actually exercise boundaries
    val some = both.filter(size(col("k")) > 0).count()
    assert(some > 0)
  }

  test("edge cases: short, exact-window, empty, and multi-byte text") {
    val ss = spark; import ss.implicits._
    val rows = Seq(
      "",                        // empty
      "short",                   // < one window
      "0123456789abcdef",        // exactly one window (pos 16 maybe)
      "0123456789abcdefg",       // one char past
      "中文" * 20,       // CJK, 40 chars / 120 bytes
      ("中 a b " * 10) + "tail mixed ascii éé") // mixed widths
      .toDF("text")
    val both = rows
      .withColumn("k", DedupQueries.cdcBoundaries(col("text")))
      .withColumn("d", DedupQueries.cdcBoundariesDeclarative)
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"text='${r.getString(0).take(30)}' kernel=${r.getSeq[Int](1)} " +
          s"hof=${r.getSeq[Int](2)}")
    }
  }

}
