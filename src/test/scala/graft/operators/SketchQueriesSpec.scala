package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables
import graft.functions.TextFunctions

class SketchQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sk1 sketch values sit within error bounds of the exact answers") {
    val approx = SketchQueries.sk1(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Tables.documents(spark, dir)
      .select(col("source"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.tokenCount(col("text")).as("toks"))
      .groupBy(col("source"))
      .agg(countDistinct(col("fp")).as("unique"),
        expr("percentile(toks, 0.5)").as("p50"),
        expr("percentile(toks, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(approx.keySet === exact.keySet && approx.nonEmpty)
    approx.foreach { case (src, a) =>
      val e = exact(src)
      val (au, eu) = (a.getLong(2).toDouble, e.getLong(1).toDouble)
      assert(math.abs(au - eu) / eu <= 0.1, s"$src: HLL unique $au vs exact $eu")
      // percentile_approx returns a value FROM the data; with accuracy
      // 5000 over these cardinalities it lands within the exact
      // interpolated quantile ± a tight band
      assert(math.abs(a.getLong(3) - e.getDouble(2)) <= math.max(2.0, e.getDouble(2) * 0.05),
        s"$src: p50 ${a.getLong(3)} vs exact ${e.getDouble(2)}")
      assert(math.abs(a.getLong(4) - e.getDouble(3)) <= math.max(2.0, e.getDouble(3) * 0.05),
        s"$src: p95 ${a.getLong(4)} vs exact ${e.getDouble(3)}")
    }
  }

  test("sketches are deterministic across runs") {
    val r1 = SketchQueries.sk1(spark, dir).collect().toSeq
    val r2 = SketchQueries.sk1(spark, dir).collect().toSeq
    assert(r1 === r2)
  }
}
