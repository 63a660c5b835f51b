package graft.joins

import java.nio.file.Files
import graft.SparkSpec

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("same-key bucketed tables join with no Exchange on either side") {
    val loc = Files.createTempDirectory("bucketdb").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '$loc'")
    val facts = Seq.tabulate(1000)(i => (i.toLong % 97, s"f$i")).toDF("k", "fval")
    val dims = Seq.tabulate(97)(i => (i.toLong, s"d$i")).toDF("k", "dval")
    BucketedJoin.writeBucketed(facts, "bucketdb.facts_b", "k", 4)
    BucketedJoin.writeBucketed(dims, "bucketdb.dims_b", "k", 4)

    // force the sort-merge path: tiny test tables would otherwise take a
    // BroadcastHashJoin (which bypasses bucketing entirely — at real
    // fact-fact scale neither side broadcasts)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedJoin.join(spark, "bucketdb.facts_b", "bucketdb.dims_b", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 1000)

      // the same join on unbucketed data shuffles — proves the assertion bites
      val unbucketed = facts.join(dims, Seq("k"))
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
