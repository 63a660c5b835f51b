package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join results on skewed data") {
    // 90% of fact rows on one hot key
    val fact = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k${i % 7}", i.toLong))
      .toDF("key", "id")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k3", "B"), ("k5", "C")).toDF("key", "v")

    val plain = fact.join(dim, Seq("key")).select($"key", $"id", $"v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "key", "id", salts = 8)
      .select($"key", $"id", $"v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

    assert(salted === plain)
    assert(salted.count(_._1 == "hot") === 900)
  }

  test("salt is deterministic and spreads the hot key") {
    val df = (1 to 1000).map(i => ("hot", i.toLong)).toDF("key", "id")
    val counts = df.withColumn("s", SkewJoin.salt($"id", 8))
      .groupBy($"s").count().collect().map(_.getLong(1))
    assert(counts.length === 8)          // all 8 salt buckets hit
    assert(counts.max < 900)             // no bucket holds ~everything
    // deterministic across evaluations
    val a = df.withColumn("s", SkewJoin.salt($"id", 8)).collect().map(_.getInt(2)).toSeq
    val b = df.withColumn("s", SkewJoin.salt($"id", 8)).collect().map(_.getInt(2)).toSeq
    assert(a === b)
  }
}
