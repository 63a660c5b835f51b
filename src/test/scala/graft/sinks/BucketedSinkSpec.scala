package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    dropManagedTables("b_orders", "b_lineitem")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    BucketedSink.write(orders, "b_orders", "o_orderkey", 4, sortCol = Some("o_orderkey"))
    BucketedSink.write(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4, sortCol = Some("o_orderkey"))

    // force a non-broadcast join so co-location is what removes the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        .groupBy($"o_orderpriority").agg(sum($"l_quantity"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce an Exchange on either side
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
