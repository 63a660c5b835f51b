package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  test("kernel hash set == md5-prefix of the HOF distinct shingle set") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    def md5Prefix(hex: String): Long = java.lang.Long.parseUnsignedLong(hex.take(16), 16)
    val viaHof = docs.select($"doc_id",
        array_distinct(Dedup.rawWordShingles($"text", 3)).as("sh"))
      .select($"doc_id", explode($"sh").as("g")).select($"doc_id", md5($"g").as("h"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => md5Prefix(r.getString(1))).toSet }
    val viaKernel = docs.select($"doc_id", Dedup.shingleHashesExpr($"text", 3).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // HOF side drops docs with no shingles at the explode; kernel keeps
    // them with an empty set
    viaHof.foreach { case (id, hs) => assert(viaKernel(id) === hs, s"doc $id") }
    (viaKernel.keySet -- viaHof.keySet).foreach { id =>
      assert(viaKernel(id).isEmpty, s"doc $id should have no shingles")
    }
  }

  test("short input yields an empty array (not null); duplicates collapse") {
    val rows = Seq("a b", "a b c a b c").toDF("text")
      .select(Dedup.shingleHashesExpr($"text", 3).as("hs"))
      .collect()
    assert(rows(0).getSeq[Long](0).isEmpty)   // 2 tokens < n=3
    // "a b c a b c": shingles = abc, bca, cab, abc -> 3 distinct
    assert(rows(1).getSeq[Long](0).length === 3)
  }
}
