package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.similarity.Similarity

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._
  import TopKAggregator._

  test("heap top-k equals window top-k on the real similarity workload") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cand = e.select($"vec_id".as("cand_id"), Similarity.scaled($"embedding").as("cv"))
      .withColumn("cn", Similarity.dotScaled($"cv", $"cv"))
    val q = broadcast(e.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), Similarity.scaled($"embedding").as("qv"))
      .withColumn("qn", Similarity.dotScaled($"qv", $"qv")))
    val pairs = cand.crossJoin(q)
      .filter($"cand_id" =!= $"query_id")
      .select($"query_id",
        round(Similarity.cosineWithNorms(
          Similarity.dotScaled($"cv", $"qv"), $"cn", $"qn"), 6).as("cos"),
        $"cand_id")

    // window form
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id")
    val windowed = pairs.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"query_id", $"cand_id", $"cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // aggregator form: k-bounded partial buffers, k rows shuffled per group
    val agged = pairs.as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, cos, id) => Scored(cos, id) }
      .agg(TopK(5).toColumn)
      .flatMap { case (qid, top) => top.map(s => (qid, s.id, s.score)) }
      .collect().toSet

    assert(agged === windowed)
  }

  test("merge respects k bound and ordering across partial buffers") {
    val topk = TopK(3)
    val a = Seq(Scored(0.9, 1), Scored(0.5, 2), Scored(0.7, 3))
      .foldLeft(topk.zero)(topk.reduce)
    val b = Seq(Scored(0.8, 4), Scored(0.95, 5), Scored(0.5, 0))
      .foldLeft(topk.zero)(topk.reduce)
    val merged = topk.finish(topk.merge(a, b))
    assert(merged === Seq(Scored(0.95, 5), Scored(0.9, 1), Scored(0.8, 4)))
    // tie-break: same score → lower id wins
    val t = Seq(Scored(0.5, 9), Scored(0.5, 1), Scored(0.5, 4), Scored(0.5, 2))
      .foldLeft(topk.zero)(topk.reduce)
    assert(topk.finish(t) === Seq(Scored(0.5, 1), Scored(0.5, 2), Scored(0.5, 4)))
  }
}
