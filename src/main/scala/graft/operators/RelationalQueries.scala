package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Relational operator coverage (SURVEY.md §2.2–§2.7) expressed
  * Spark-first over the TESTDATA tables, each with a DuckDB oracle.
  *
  * Oracle-parity conventions (the driver hash-compares values):
  *  - double SUMs go through DECIMAL(18,4) so both engines sum exactly
  *    (IEEE double summation is order-dependent; decimal is not), then
  *    cast back to double for a stable schema;
  *  - AVG = exact decimal sum cast to double, divided by count;
  *  - every result carries a total ORDER BY so row order is identical.
  */
object RelationalQueries {

  /** Exact-sum helper: deterministic across engines and partitionings. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  // q1_agg — TPC-H Q1 shape: multi-aggregate groupBy over lineitem.
  // Mirrors the reference's record-count metadata aggregation collapsed to
  // one pass (SURVEY §4.2; reference recomputes counts per rule,
  // /root/reference/src/price_zone/transform_spark_job.py:90-94).
  def q1(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, d) => q1(s, d)))

  val oracleSql: Map[String, String] = Map(
    "q1_agg" -> q1Sql)
}
