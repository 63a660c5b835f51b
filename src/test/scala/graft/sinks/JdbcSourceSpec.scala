package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The JDBC READ path against a real engine (the inverse of the S6
  * loader): rows landed by `JdbcReplaceSink` come back through Spark's
  * JDBC source with values, types, and pushdown intact — what a
  * reconciliation job reading the reference's MySQL target would run.
  * Pushdown matters at scale: the WHERE clause must reach the database
  * (the source reports it as PushedFilters / an external-engine
  * predicate), not filter post-transfer on the Spark side.
  */
class JdbcSourceSpec extends SparkSpec {
  import spark.implicits._

  test("JDBC source round-trips the sink's rows with filter pushdown") {
    val table = s"src_rt_${java.util.UUID.randomUUID().toString.replace("-", "").take(8)}"
    val c = DerbyDb.conn()
    try {
      val st = c.createStatement()
      st.execute(
        s"""CREATE TABLE $table (
           |  supc INT NOT NULL, customer_id INT NOT NULL, price_zone INT,
           |  PRIMARY KEY (supc, customer_id))""".stripMargin)
      st.close()
    } finally c.close()

    val rows = (1 to 200).map(i => (i, i % 7, i % 5))
    JdbcReplaceSink.write(
      rows.toDF("supc", "customer_id", "price_zone"),
      JdbcReplaceSink.Config(
        table = table,
        columns = Seq("supc", "customer_id", "price_zone"),
        dialect = JdbcReplaceSink.DeleteThenInsert,
        keyColumns = Seq("supc", "customer_id")),
      new DerbyConnFactory)

    val props = new java.util.Properties()
    val back = spark.read.jdbc(DerbyDb.url, table, props)
    assert(back.count() === 200L)
    assert(back.columns.map(_.toLowerCase).sorted ===
      Array("customer_id", "price_zone", "supc"))

    // value fidelity through the round trip
    val got = back.select(
      col("SUPC").cast("int"), col("CUSTOMER_ID").cast("int"),
      col("PRICE_ZONE").cast("int"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === rows.toSet)

    // filter pushdown: the predicate must appear in the JDBC scan node,
    // not only as a Spark-side Filter above it
    val filtered = back.filter(col("SUPC") > 150)
    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.replaceAll("\\s", "").contains("SUPC"),
      s"JDBC scan did not report the pushed predicate:\n$physical")
    assert(filtered.count() === 50L)
  }
}
