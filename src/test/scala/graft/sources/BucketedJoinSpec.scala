package graft.sources

import graft.SparkSpec
import graft.sinks.BucketedSink
import org.apache.spark.sql.functions._

/** The full bucketing contract, beyond BucketedSinkSpec's no-exchange
  * check: with one file per bucket (BucketedSink repartitions on the
  * key) and the sorted-scan flag, the per-task Sort below the
  * SortMergeJoin disappears too, and a groupBy on the bucket key
  * aggregates without any Exchange.
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def dropManaged(tables: String*): Unit = dropManagedTables(tables: _*)

  test("same-bucket-count tables join with zero ShuffleExchange; sorted buckets skip the Sort") {
    dropManaged("bj_orders", "bj_customer")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_acctbal"))
    BucketedSink.write(orders, "bj_orders", "o_custkey", 4, sortCol = Some("o_custkey"))
    BucketedSink.write(customer, "bj_customer", "o_custkey", 4, sortCol = Some("o_custkey"))
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path: the claim under test is that the
      // SHUFFLE is gone, not that a tiny side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // sorted-bucket scans only advertise their ordering behind this
      // flag since Spark 3.1 (planning-time file listing)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val joined = spark.table("bj_orders").join(spark.table("bj_customer"), Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
      // bucket-sorted, one file per bucket: no Sort below the join
      assert(!plan.contains("Sort ["), plan)
      // and the join is still correct
      val expected = orders.join(customer, Seq("o_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }

  test("groupBy on the bucket key aggregates with zero ShuffleExchange") {
    // written by the previous test; bucketed by o_custkey
    val agg = spark.table("bj_orders").groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(agg.count() > 0)
  }
}
