package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the adaptive skew-safe self-join (VERDICT r2 item 6): on a
  * skewed fixture (one 8-token prefix shared by thousands of docs —
  * boilerplate-heavy corpus shape) the hot key is detected, salted
  * across cells, and the result stays row-identical to the plain join;
  * and d4 itself produces identical output with the skew route forced
  * on real data.
  */
class SkewSelfJoinSpec extends SparkSpec {
  import spark.implicits._

  // 3000 rows behind one hot key + 50 cold keys of 10 rows each
  private def fixture = {
    val hot = (1 to 3000).map(i => (i.toLong, "hotkey"))
    val cold = (1 to 50).flatMap(k => (1 to 10).map(i => ((10000 + k * 100 + i).toLong, s"cold$k")))
    (hot ++ cold).toDF("id", "k")
  }

  test("skew-safe join equals the plain join on a skewed fixture") {
    val df = fixture
    val a = df.select(col("id").as("id_a"), col("k"))
    val b = df.select(col("id").as("id_b"), col("k"))
    val plain = a.join(b, Seq("k")).filter(col("id_a") < col("id_b"))
      .select("k", "id_a", "id_b").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val safe = SkewJoin.skewSafeEquiJoin(a, b, "k", "id_a", hotThreshold = 100, salts = 8)
      .filter(col("id_a") < col("id_b"))
      .select("k", "id_a", "id_b").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(safe === plain)
    assert(safe.count(_._1 == "hotkey") === 3000L * 2999 / 2)
  }

  test("hot key splits across salt cells; no cell re-creates the straggler") {
    val df = fixture.filter(col("k") === "hotkey")
    val cells = df.select(SkewJoin.salt(col("id"), 8).as("s"))
      .groupBy(col("s")).count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.keySet === (0 until 8).toSet, "every salt cell used")
    // a perfectly even split is 375/cell; allow 2x imbalance, which is
    // still 4x better than the unsalted single-reducer pile-up
    assert(cells.values.max <= 750, s"max cell ${cells.values.max}")
  }

  test("no hot keys -> single join, no union branch in the plan") {
    val df = fixture.filter(col("k") =!= "hotkey")
    val a = df.select(col("id").as("id_a"), col("k"))
    val b = df.select(col("id").as("id_b"), col("k"))
    val plan = SkewJoin.skewSafeEquiJoin(a, b, "k", "id_a", hotThreshold = 100, salts = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"))
  }

  test("d4 output is identical with the skew route forced") {
    val dir = "/root/testdata/sf0.001"
    val normal = DedupQueries.d4(spark, dir).collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.dedup.skewThreshold", "1")
    try {
      val salted = DedupQueries.d4(spark, dir).collect().map(_.toString).toSeq
      assert(salted === normal)
      assert(normal.nonEmpty)
    } finally spark.conf.unset("spark.graft.dedup.skewThreshold")
  }
}
