package graft.dedup

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.SparkSpec
import graft.functions.TextFunctions

class SimHashSigSpec extends SparkSpec {
  import spark.implicits._

  /** The reference formulation the kernel must reproduce bit-for-bit:
    * explode tokens, one md5 per token, 63 sign sums (hex high bit for
    * j<=32, hex-char ascii parity for j>32), pack sum>0 bits. */
  private def sigViaAggregate(docs: org.apache.spark.sql.DataFrame) = {
    val tok = docs
      .select($"doc_id", explode(TextFunctions.tokens($"text")).as("_t"))
      .withColumn("_h", md5($"_t"))
    def bitCond(j: Int) =
      if (j <= 32) substring($"_h", j, 1) >= lit("8")
      else ascii(substring($"_h", j - 32, 1)) % 2 === 1
    val bitSums = (1 to 63).map { j =>
      sum(when(bitCond(j), lit(1)).otherwise(lit(-1))).as(s"_b$j")
    }
    val sigTerm = (1 to 63).map { j =>
      when(col(s"_b$j") > 0, lit(1L << (j - 1))).otherwise(lit(0L))
    }.reduce(_ + _)
    tok.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id", sigTerm.cast(LongType).as("sig"))
  }

  test("kernel signature is bit-identical to the explode+aggregate plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val viaAgg = sigViaAggregate(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = docs.select($"doc_id", Dedup.simhashSigExpr($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr.keySet === viaAgg.keySet)
    viaExpr.foreach { case (id, sig) => assert(sig === viaAgg(id), s"doc $id") }
  }

  test("signature is non-negative (bit 63 unused) and codegen-fused") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val negs = docs.select(Dedup.simhashSigExpr($"text").as("sig"))
      .filter($"sig" < 0).count()
    assert(negs === 0L)
    val plan = docs.select(Dedup.simhashSigExpr($"text").as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("simhash_sig") && l.trim.startsWith("*(")), plan)
  }

  test("empty token array yields null; single token sets every voted bit") {
    // split("", " ") gives [""], ONE empty token, so null needs a true
    // empty array — build one directly.
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("toks")
    val viaExpr = empty.select(
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.expressions.SimHashSig(
          org.apache.spark.sql.GraftColumnBridge.expression($"toks"))).as("sig"))
      .head()
    assert(viaExpr.isNullAt(0))

    // one token: every counter is +1 or -1, so the signature is exactly
    // the token's own bit pattern — cross-check against md5 hex digits.
    val one = Seq(Tuple1("hello")).toDF("text")
      .select(Dedup.simhashSigExpr($"text").as("sig")).head().getLong(0)
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (1 to 32).foreach { j =>
      val expect = hex(j - 1) >= '8'
      assert(((one >> (j - 1)) & 1L) === (if (expect) 1L else 0L), s"bit $j")
    }
    (33 to 63).foreach { j =>
      val expect = (hex(j - 33).toInt % 2) == 1
      assert(((one >> (j - 1)) & 1L) === (if (expect) 1L else 0L), s"bit $j")
    }
  }
}
