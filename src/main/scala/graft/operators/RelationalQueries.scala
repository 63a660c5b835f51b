package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  *  - every result carries a total ORDER BY so row order is identical;
  *  - Spark ASC sorts default NULLS FIRST while DuckDB defaults NULLS
  *    LAST — nullable sort keys are coalesced away or explicitly
  *    NULLS FIRST in the oracle;
  *  - DuckDB SUM(BIGINT)→HUGEINT and year()→BIGINT are cast back to
  *    Spark's types in the oracle.
  *
  * Scale notes (100 TB): every query below is a pure declarative plan —
  * filters/projections reach the parquet scan (PushedFilters), dimension
  * joins are explicitly `broadcast()`, aggregates are partial+final
  * hash aggregates under whole-stage codegen, and no driver-side
  * collection happens anywhere.
  */
object RelationalQueries {

  /** Exact-sum helper: deterministic across engines and partitionings. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Exact-avg helper: decimal sum → double, divided by count. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType) / count(c)

  // ---------------------------------------------------------------------
  // q1_agg — TPC-H Q1 shape: multi-aggregate groupBy over lineitem.
  // The reference recomputes counts with separate scans
  // (/root/reference/src/price_zone/transform_spark_job.py:90-94); our
  // engine's convention is one aggregation pass (SURVEY §4.2, A2).
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
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // q2_filter_project — predicate + projection; both push to the scan
  // (P1/P2 + F-family shape: SURVEY §2.2, §2.3).
  def q2(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-07-01")) &&
        col("l_discount") > lit(0.05) && col("l_quantity") < lit(10.0))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q2Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
      |  AND l_discount > 0.05 AND l_quantity < 10.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------------
  // q3_join_broadcast — star join: fact × three broadcast dimensions
  // (J1's semantics at scale: broadcast equi-join, SURVEY §2.6).
  def q3(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))

  private val q3Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q4_semi_join — EXISTS as left_semi (J2: membership, SURVEY §2.6).
  def q4(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= lit(45.0)).select(col("l_orderkey"))
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45.0)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q5_anti_join — NOT EXISTS as left_anti (J3/F8: set difference —
  // the reference's remove_records_of_given_opcos generalized;
  // /root/reference/src/price_zone/validator.py:28-32).
  def q5(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === lit("P")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  private val q5Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q6_distinct — distinct group keys (A1/F9: get_opco_list generalized;
  // /root/reference/src/price_zone/validator.py:24-25).
  def q6(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  private val q6Sql =
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q7_topk — global top-k: ORDER BY ... LIMIT compiles to TakeOrderedAndProject
  // (no full sort at scale; per-partition heaps + driver merge of k rows).
  def q7(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  private val q7Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------------
  // q8_window — ranking + windowed exact sum per partition (§2.7; the
  // reference's FIFO-rank control-plane logic as row_number,
  // /root/reference/src/AnalyzeEtlWaitStatusLambda/index.py:99-139).
  def q8(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(ws).cast(DoubleType))
      .filter(col("rn") <= lit(2))
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice"), col("running_spend"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q8Sql =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice, running_spend FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |  FROM orders) t
      |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------------
  // q9_setops — UNION (distinct) then EXCEPT (§2.7: invalid-opco list
  // union, failed = cluster − successful;
  // /root/reference/src/TakeBackupDecisionLambda/index.py:110).
  def q9(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val building = c.filter(col("c_mktsegment") === lit("BUILDING")).select(col("c_custkey"))
    val machinery = c.filter(col("c_mktsegment") === lit("MACHINERY")).select(col("c_custkey"))
    val bigSpenders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > lit(300000.0))
      .select(col("o_custkey").as("c_custkey"))
    building.union(machinery).distinct()
      .except(bigSpenders)
      .orderBy(col("c_custkey"))
  }

  private val q9Sql =
    """SELECT c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  UNION
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q10_rollup — hierarchical totals; NULL subtotal keys are coalesced
  // to 'ALL' so null-ordering semantics never enter the compare.
  def q10(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))
      .orderBy(col("rf"), col("ls"))

  private val q10Sql =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
      |  COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // ---------------------------------------------------------------------
  // q11_case_bucket — CASE WHEN bucketing + conditional aggregation
  // (X10/X11 cast semantics, SURVEY §2.4).
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val bucket = when(col("l_quantity") < 10, lit("small"))
      .when(col("l_quantity") < 30, lit("medium"))
      .otherwise(lit("large"))
    Tables.lineitem(spark, dir)
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        dsum(when(col("l_returnflag") === lit("R"), col("l_extendedprice"))
          .otherwise(lit(0.0))).as("returned_value"),
        sum(when(col("l_tax") > lit(0.05), lit(1L)).otherwise(lit(0L))).as("high_tax_n"))
      .orderBy(col("bucket"))
  }

  private val q11Sql =
    """SELECT CASE WHEN l_quantity < 10 THEN 'small'
      |            WHEN l_quantity < 30 THEN 'medium' ELSE 'large' END AS bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS returned_value,
      |  CAST(SUM(CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS high_tax_n
      |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------------
  // q12_agg_join — aggregate subquery joined back (customers above their
  // nation's average balance). The per-nation aggregate is tiny →
  // broadcast; the fact side never shuffles.
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val natAvg = c.groupBy(col("c_nationkey").as("nk"))
      .agg(davg(col("c_acctbal")).as("nation_avg"))
    c.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"), col("nation_avg"))
      .orderBy(col("c_custkey"))
  }

  private val q12Sql =
    """SELECT c_custkey, c_nationkey, c_acctbal, nation_avg
      |FROM customer JOIN (
      |  SELECT c_nationkey AS nk,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(c_acctbal) AS nation_avg
      |  FROM customer GROUP BY c_nationkey) t ON c_nationkey = nk
      |WHERE c_acctbal > nation_avg ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q13_dates — date_trunc / year extraction (X6–X8, SURVEY §2.4).
  // Timestamps are rendered as ISO strings in the output: parquet µs vs
  // DuckDB/pandas ns dtypes would otherwise diverge in the hash compare.
  def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd").as("qtr"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("yr"), col("qtr"))

  private val q13Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin

  // ---------------------------------------------------------------------
  // q14_json — JSON field extraction from the events.props payload
  // (semi-structured column handling; events table, TESTDATA.md).
  def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  private val q14Sql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
      |  MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q15_strings — string function battery (X1/X3/X13, SURVEY §2.4):
  // substring key decode (the reference's composite-key split,
  // /root/reference/src/pa/pa_etl_script.py:256-257), concat, upper,
  // length, LIKE prefix.
  def q15(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment").startsWith("B") || col("c_mktsegment").like("%WARE%"))
      .select(
        col("c_custkey"),
        expr("CAST(substring(c_name, 10) AS BIGINT)").as("name_num"),
        concat(lower(col("c_mktsegment")), lit(":"),
          length(col("c_name")).cast(StringType)).as("tag"),
        upper(substring(col("c_name"), 1, 4)).as("prefix"))
      .orderBy(col("c_custkey"))

  private val q15Sql =
    """SELECT c_custkey,
      |  CAST(substring(c_name, 10) AS BIGINT) AS name_num,
      |  lower(c_mktsegment) || ':' || CAST(length(c_name) AS VARCHAR) AS tag,
      |  upper(substring(c_name, 1, 4)) AS prefix
      |FROM customer
      |WHERE c_mktsegment LIKE 'B%' OR c_mktsegment LIKE '%WARE%'
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q17_cube — full grouping-sets lattice (completes rollup coverage);
  // NULL subtotal keys coalesced away as in q10.
  def q17(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  private val q17Sql =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // ---------------------------------------------------------------------
  // q16_sql — the SQL entry surface: the same engine semantics through
  // spark.sql over registered views (TPC-H Q3 shape adapted to the
  // testdata schema). Everything else in this library is DataFrame API;
  // a user of the reference could equally drive graft with plain SQL.
  def q16(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT o_orderkey, date_format(o_orderdate, 'yyyy-MM-dd') AS odate,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY o_orderkey, 2
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)
  }

  private val q16Sql =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > TIMESTAMP '1997-01-01'
      |GROUP BY o_orderkey, 2
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------------
  // q18_pivot — pivot (long→wide) with EXPLICIT pivot values: passing
  // Seq("F","O") skips the extra distinct-values job Spark otherwise
  // runs before planning the pivot — at 100 TB that job is a full
  // column scan. The oracle is the CASE-aggregate restatement (what a
  // pivot is).
  def q18(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_quantity")))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")
      .orderBy(col("l_returnflag"))

  private val q18Sql =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_f,
      |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_o
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q19_percentiles — exact quartiles. Prices go through DECIMAL cents →
  // BIGINT so the interpolation (index frac ∈ {0, .25, .5, .75} over
  // integers) is exact in double on any engine — raw-double percentiles
  // can differ in the last ulp when engines interpolate as
  // (1−d)·lo + d·hi vs lo + d·(hi−lo).
  def q19(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("cents",
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(cents, 0.25)").as("p25_cents"),
        expr("percentile(cents, 0.5)").as("p50_cents"),
        expr("percentile(cents, 0.75)").as("p75_cents"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val q19Sql =
    """WITH c AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  quantile_cont(cents, 0.25) AS p25_cents,
      |  quantile_cont(cents, 0.5) AS p50_cents,
      |  quantile_cont(cents, 0.75) AS p75_cents,
      |  COUNT(*) AS n
      |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q20_grouping_sets — explicit heterogeneous GROUPING SETS (two
  // single-column marginals + grand total, a set NOT derivable from
  // rollup or cube) with the grouping_id disambiguator — the remaining
  // piece of the grouping lattice after q10/q17. Spark plans one
  // Expand + single aggregate; gid bit order (first column = MSB) is
  // restated in the oracle from per-column GROUPING() bits.
  def q20(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n"), col("total"))
      .orderBy(col("gid"), col("status"), col("priority"))

  private val q20Sql =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, status, priority""".stripMargin

  // ---------------------------------------------------------------------
  // q21_rolling_window — RANGE-frame windowed aggregation (q8 covers the
  // ROWS frame; RANGE is the other §2.7 frame kind and the one rolling
  // time-series metrics need): per customer, total spend and order count
  // over the trailing 30 DAYS of each order — peers at the same day all
  // enter every frame they fall in, which only a RANGE frame expresses
  // (a ROWS frame would cut same-day peers by arbitrary tie order). The
  // order date becomes an integer day index so the frame bound is exact
  // integer arithmetic on both engines; one shuffle on the partition
  // key, one sort, no self-join (the naive form is a range self-join —
  // O(n·window) at 100 TB; the RANGE frame is one sorted pass).
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-29, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).cast(LongType).as("day"),
        col("o_totalprice"))
      .withColumn("spend_30d",
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w).cast(DoubleType))
      .withColumn("n_30d", count(lit(1)).over(w))
      .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
  }

  private val q21Sql =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day,
      |    o_totalprice
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, day, o_totalprice,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS spend_30d,
      |  COUNT(*) OVER w AS n_30d
      |FROM o
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
      |             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, day, o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // q22_corr_subquery — correlated subqueries, the planner path the rest
  // of the library never exercises: a correlated scalar subquery
  // (per-customer big-order count) and a correlated NOT EXISTS, written
  // as SQL a warehouse user would. Catalyst DECORRELATES both — the
  // scalar subquery becomes an aggregate + left outer join, NOT EXISTS
  // a null-aware anti join — so what executes is the same join/agg
  // machinery the rest of the library pins, not a per-row re-execution
  // (the O(n·m) nested-loop a naive engine would run).
  def q22(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c_custkey, c_acctbal,
        |  (SELECT COUNT(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0) AS n_big
        |FROM customer c
        |WHERE c_acctbal > 7000.0
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o2
        |    WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)
  }

  private val q22Sql =
    """SELECT c_custkey, c_acctbal,
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0) AS n_big
      |FROM customer c
      |WHERE c_acctbal > 7000.0
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o2
      |    WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q23_rank_family — the remaining §2.7 window functions in one gate:
  // ntile (decile bucketing — the quantile-binning step a feature
  // pipeline runs), percent_rank (relative position), and lead (gap to
  // the next order). All three ride ONE window definition, so one
  // shuffle + one sort serves the whole family. percent_rank is
  // (rank−1)/(n−1) — the same two integer operands divided by the same
  // IEEE rules in both engines, so the doubles match bit-for-bit
  // without decimal scaffolding. Restricted to one segment's orders to
  // keep the gate row count bounded.
  def q23(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === lit("1-URGENT"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("decile", ntile(10).over(w).cast(LongType))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q23Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(ntile(10) OVER w AS BIGINT) AS decile,
      |  percent_rank() OVER w AS pr,
      |  lead(o_totalprice) OVER w AS next_price
      |FROM orders
      |WHERE o_orderpriority = '1-URGENT'
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // q24_unpivot — the inverse of q18's pivot (§2.7 reshape breadth):
  // melt the wide (qty_f, qty_o) columns back to long form with the
  // native `unpivot` operator, recovering exactly the direct GROUP BY —
  // the oracle IS that direct aggregation, so the gate proves
  // pivot → unpivot is lossless. Absent (flag, status) combinations
  // surface as NULL cells in the wide form; unpivot emits them as NULL
  // rows, filtered here because the long-form truth never had them.
  def q24(spark: SparkSession, dir: String): DataFrame =
    q18(spark, dir)
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("qty_f"), col("qty_o")),
        "linestatus", "qty")
      .filter(col("qty").isNotNull)
      .withColumn("linestatus",
        when(col("linestatus") === "qty_f", lit("F")).otherwise(lit("O")))
      .orderBy(col("l_returnflag"), col("linestatus"))

  private val q24Sql =
    """SELECT l_returnflag, l_linestatus AS linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q25_outer_join — FULL OUTER join with genuine null extension on
  // both sides (§2.6: the one join type no other gate exercises):
  // high-balance customers vs high-balance suppliers aggregated per
  // nation — the filters leave nations present on only one side, so
  // both null-extension paths materialize. Count columns coalesce to 0
  // (the analytics convention); balance columns stay NULL where the
  // side is absent, pinning the engines' null semantics through the
  // hash compare. The join key is coalesced before ORDER BY (null
  // sort placement differs between engines — never sort a nullable
  // key). Plan note: both sides are nation-cardinality aggregates, so
  // the outer join is a broadcast-able 25-row join at any corpus size.
  def q25(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 9000.0)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("cust_bal"))
    val s = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") > 9000.0)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"), dsum(col("s_acctbal")).as("supp_bal"))
    c.join(s, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"), col("cust_bal"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"), col("supp_bal"))
      .orderBy(col("nationkey"))
  }

  // ---------------------------------------------------------------------
  // q27_setops_all — BAG-semantics set operations (q9 covers the
  // DISTINCT forms): EXCEPT ALL keeps max(m−n, 0) copies per value,
  // INTERSECT ALL keeps min(m, n). Spark plans both as aggregate-
  // count-then-replicate (no sort-based dedup), which is the right
  // distributed shape — the exchange carries one row per distinct
  // value with its multiplicity, not the multiset. The gate reports
  // the resulting multisets grouped (value, multiplicity) so the
  // output is order-free and compact at any scale.
  def q27(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val a = li.filter(col("l_discount") > lit(0.05)).select(col("l_quantity"))
    val b = li.filter(col("l_returnflag") === lit("R")).select(col("l_quantity"))
    val ex = a.exceptAll(b).groupBy(col("l_quantity"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    val in = a.intersectAll(b).groupBy(col("l_quantity"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    ex.unionAll(in)
      .select(col("op"), col("l_quantity"), col("n"))
      .orderBy(col("op"), col("l_quantity"))
  }

  private val q27Sql =
    """WITH a AS (SELECT l_quantity FROM lineitem WHERE l_discount > 0.05),
      |b AS (SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R')
      |SELECT 'except_all' AS op, l_quantity, COUNT(*) AS n
      |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 2
      |UNION ALL
      |SELECT 'intersect_all', l_quantity, COUNT(*)
      |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 2
      |ORDER BY op, l_quantity""".stripMargin

  // ---------------------------------------------------------------------
  // q26_median_disc — EXACT distributed median (lower/discrete form):
  // per nation, the c_acctbal value at rank ceil(n/2) in (acctbal,
  // custkey) order. Exact medians don't decompose into partial
  // aggregates, so the honest distributed shape is one shuffle by group
  // + a per-group sort with two windows fused over the same ordering
  // (rank and group count share a single exchange — .explain shows one).
  // The selected value is a STORED double (no arithmetic touches it),
  // so the cross-engine compare is bit-exact; the tie-break on custkey
  // makes the rank total. At corpus scale the sketch path (sk1's
  // KLL quantiles) is the cheap alternative; this gate pins the exact
  // one.
  def q26(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("c_nationkey"))))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("c_nationkey").as("nationkey"), col("cnt").as("n_cust"),
        col("c_acctbal").as("median_acctbal"))
      .orderBy(col("nationkey"))
  }

  private val q26Sql =
    """WITH r AS (
      |  SELECT c_nationkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal, c_custkey) AS rn,
      |    COUNT(*) OVER (PARTITION BY c_nationkey) AS cnt
      |  FROM customer)
      |SELECT c_nationkey AS nationkey, CAST(cnt AS BIGINT) AS n_cust,
      |  c_acctbal AS median_acctbal
      |FROM r WHERE rn = (cnt + 1) // 2
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // q28_hopping_windows — SLIDING (hopping) time-window aggregation:
  // 1-hour windows advancing every 15 minutes, so each event lands in
  // exactly 4 overlapping windows. st1 pins the tumbling form; this is
  // the overlapping one (`window(ts, "1 hour", "15 minutes")`). Spark
  // plans it as a generate (4 window structs per row, map-side — the
  // fan-out happens before the exchange, so the shuffle carries
  // (window, type) partial aggregates, not 4× the event stream). The
  // oracle restates the epoch-aligned window arithmetic directly:
  // start = floor(ts/15min)*15min − k*15min, k ∈ 0..3.
  // (events.ts is an epoch-nanos long — TIMESTAMP(NANOS) parquet; both
  // engines truncate to micros identically, see Streaming.tsMicros.)
  def q28(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .withColumn("tsm", timestamp_micros(graft.streaming.Streaming.tsMicros(col("ts"))))
      .groupBy(window(col("tsm"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  private val q28Sql =
    """SELECT (epoch_us(ts) // 900000000 - t.k) * 900000000 AS window_start,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events CROSS JOIN range(0, 4) AS t(k)
      |WHERE ts IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Scalable exact global rank (dense total order, no single-partition
    * window): range-partition by the sort key, rank within each sorted
    * partition, then add per-partition prefix offsets. The offset table
    * is one row per partition (bounded by `spark.sql.shuffle.partitions`,
    * not by data) so its single-partition window and the broadcast back
    * are O(partitions) — the data itself never funnels through one task,
    * which is what `row_number().over(Window.orderBy(...))` would do.
    * Keys must form a strict total order (include a unique tie-breaker).
    */
  def globalRank(df: DataFrame, keys: Seq[Column], out: String): DataFrame = {
    // NOTE (r9): a lazy localCheckpoint here (the globalPrefixSums
    // fix — the offsets branch feeds a BroadcastExchange and reuses no
    // shuffle stage, so the upstream computes twice) was TRIED and
    // REVERTED: rank consumers carry the full ranked row through the
    // helper, and the RDD-level object cache (deserialized rows, GC
    // pressure) measured SLOWER than the duplicate compute on every
    // rank consumer in a full suite A/B (q42 0.54→1.46 s, q40
    // 2.16→2.89, v18 1.25→2.07; the narrow-row prefix-sum twin keeps
    // its checkpoint, where the same A/B measured faster). The
    // duplicate compute of the upstream stays — it is the cheaper
    // evil at both tested scales.
    val parts = df.repartitionByRange(keys: _*)
      .withColumn("_pid", spark_partition_id())
    val offsets = parts.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(
        sum(col("_n")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    parts
      .withColumn("_rn",
        row_number().over(Window.partitionBy(col("_pid")).orderBy(keys: _*)))
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn(out, col("_off") + col("_rn"))
      .drop("_pid", "_rn", "_off")
  }

  /** Scalable exact global running sum (the prefix-sum sibling of
    * [[globalRank]]): range-partition by the sort key, running-sum
    * within each sorted partition, add per-partition value offsets.
    * Same O(partitions) offset table, same no-single-reducer property.
    * `keys` must form a strict total order (unique tie-breaker), which
    * also makes the default RANGE window frame equal to ROWS — no
    * tie-group smearing. `valueCol` must be integral (sums are exact). */
  def globalPrefixSum(df: DataFrame, keys: Seq[Column], valueCol: Column,
      out: String): DataFrame =
    globalPrefixSums(df, keys, Seq((valueCol, out)))

  /** Multi-column form of [[globalPrefixSum]]: N exact running sums
    * over ONE range partitioning and ONE per-partition window pass
    * (identical window specs collapse into a single WindowExec) —
    * where N chained single-column calls would range-sort the data N
    * times. x46's pair of cumulative counts measured ~15% faster at
    * sf0.1 from this fusion (the remaining cost is the shared
    * distinct-cents aggregate, not the windows). */
  def globalPrefixSums(df: DataFrame, keys: Seq[Column],
      vals: Seq[(Column, String)]): DataFrame = {
    val vs = vals.zipWithIndex.map { case ((c, out), i) => (s"_v$i", c, out) }
    val withVals = vs.foldLeft(df) { case (d, (n, c, _)) => d.withColumn(n, c) }
    // fan-out pin — same double-computation fix as [[globalRank]] (the
    // offsets branch rides a BroadcastExchange, which reuses no shuffle
    // stage; without this the whole upstream ran twice per call).
    val parts = graft.Pins.pinForFanout(withVals.repartitionByRange(keys: _*)
      .withColumn("_pid", spark_partition_id()))
    val aggs = vs.map { case (n, _, _) => sum(col(n)).as(s"_s$n") }
    val offsets = vs.foldLeft(
        parts.groupBy(col("_pid")).agg(aggs.head, aggs.tail: _*)) {
        case (d, (n, _, _)) =>
          d.withColumn(s"_off$n", coalesce(
            sum(col(s"_s$n")).over(Window.orderBy(col("_pid"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      }
      .select(col("_pid") +: vs.map { case (n, _, _) => col(s"_off$n") }: _*)
    val w = Window.partitionBy(col("_pid")).orderBy(keys: _*)
    val run = vs.foldLeft(parts) { case (d, (n, _, _)) =>
      d.withColumn(s"_run$n", sum(col(n)).over(w))
    }
    val named = vs.foldLeft(run.join(broadcast(offsets), Seq("_pid"))) {
      case (d, (n, _, out)) =>
        d.withColumn(out, col(s"_off$n") + col(s"_run$n"))
    }
    named.drop("_pid" +:
      vs.flatMap { case (n, _, _) => Seq(n, s"_off$n", s"_run$n") }: _*)
  }

  // ---------------------------------------------------------------------
  // q29_equidepth_hist — exact equi-depth (equal-frequency) histogram
  // over o_totalprice: 8 buckets, bucket = ((rank−1)·8) div n computed
  // arithmetically in BOTH engines (ntile's uneven-remainder convention
  // is engine-defined; the arithmetic form is not). Rank comes from
  // [[globalRank]] — the distributed total-order shape — so no
  // single-partition window touches the data; n rides the offset table's
  // total (a 1-row broadcast). Bucket bounds are STORED doubles
  // (min/max, no arithmetic) → bit-exact compare.
  def q29(spark: SparkSession, dir: String): DataFrame = {
    val priced = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val ranked = globalRank(priced, Seq(col("o_totalprice"), col("o_orderkey")), "rnk")
    val total = priced.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(total)) // 1-row scalar ride-along
      .withColumn("bucket", expr("((rnk - 1) * 8) div n_total + 1"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      .orderBy(col("bucket"))
  }

  private val q29Sql =
    """WITH r AS (
      |  SELECT o_totalprice,
      |    ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
      |    COUNT(*) OVER () AS n_total
      |  FROM orders)
      |SELECT ((rnk - 1) * 8) // n_total + 1 AS bucket,
      |  COUNT(*) AS n_orders, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q30_dpp_star — dynamic partition pruning on a star join: the fact
  // table is laid out partitioned by order month (the 100 TB norm —
  // date-partitioned facts), the month dimension carries the
  // year/quarter attributes, and a quarter filter on the DIM side must
  // prune the FACT scan to 3 of 80 partitions AT RUNTIME via the
  // broadcast's dynamic-pruning subquery (static pushdown can't see
  // through the join; DPP is the mechanism that makes dim-filtered
  // fact scans cheap). DppSpec pins the `dynamicpruning` expression in
  // the fact scan's PartitionFilters — the gate here pins the answer.
  // The oracle restates the join as a direct date predicate (same month
  // ⇒ same year/quarter, so the dim filter IS a fact filter).
  // Fixture memo: the month-partitioned copy of orders is SETUP, not the
  // operator under test — materialize it once per (JVM, dir) so repeated
  // gate/bench invocations time the DPP join, not the rewrite. Assumes
  // the data under `dir` is immutable for the JVM lifetime (the sk3
  // convention); regenerated-in-process data would read stale and fail
  // the gate loudly as a rows/hash mismatch.
  private val q30Fixture = scala.collection.concurrent.TrieMap.empty[String, String]
  def q30(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val tmp = q30Fixture.getOrElseUpdate(dir, {
      val t = graft.control.Scratch.dir("graft_q30_dpp")
      orders.withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .write.mode("overwrite").partitionBy("order_month").parquet(t)
      t
    })
    val fact = spark.read.parquet(tmp)
    val dim = orders
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .distinct()
      .withColumn("m0", to_date(concat(col("order_month"), lit("-01"))))
      .withColumn("yr", year(col("m0")))
      .withColumn("qtr", quarter(col("m0")))
      .filter(col("yr") === 1996 && col("qtr") === 2)
      .select(col("order_month"))
    fact.join(broadcast(dim), Seq("order_month"))
      .groupBy(col("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"),
        countDistinct(col("o_custkey")).as("n_cust"))
      .orderBy(col("order_month"))
  }

  // ---------------------------------------------------------------------
  // q31_bucketed_join — CO-LOCATED large×large join via bucketed tables:
  // both sides are written `bucketBy(8, o_orderkey)` (BucketedSink
  // repartitions on the key so each bucket is ONE file), then joined
  // with a merge hint. Because both scans report the same
  // HashClusteredDistribution, the SortMergeJoin plans with ZERO
  // Exchange — the shuffle was paid once at write time, and every
  // subsequent join/agg on the key rides it free. At 100 TB this is the
  // bucketing contract: an hourly fact-×-fact reconciliation that
  // re-shuffles nothing. The merge hint only pins the join strategy
  // (so a small-side broadcast at toy SF can't mask the claim);
  // BucketedJoinGateSpec pins the zero-Exchange plan, the oracle pins
  // the answer against the plain join.
  // Fixture memo (same contract as q30's): the bucketed tables are the
  // write-once side of the bucketing bargain — rebuild them only when
  // the data dir changes, so repeated invocations time the co-located
  // join the tables exist to make cheap. Table names carry a dir hash
  // so two dirs in one JVM cannot cross-read.
  private val q31Fixture = scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  def q31(spark: SparkSession, dir: String): DataFrame = {
    val (ordersT, itemsT) = q31Fixture.getOrElseUpdate(dir, {
      val suffix = java.lang.Integer.toHexString(dir.hashCode)
      val (ot, it) = (s"q31_orders_b_$suffix", s"q31_lineitem_b_$suffix")
      val orders = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val items = Tables.lineitem(spark, dir)
        .filter(col("l_quantity") > 25.0)
        .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
      graft.sinks.BucketedSink.dropManaged(spark, ot)
      graft.sinks.BucketedSink.dropManaged(spark, it)
      graft.sinks.BucketedSink.write(orders, ot, "o_orderkey", 8)
      graft.sinks.BucketedSink.write(items, it, "o_orderkey", 8)
      (ot, it)
    })
    spark.table(itemsT).hint("merge")
      .join(spark.table(ordersT).hint("merge"), Seq("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val q31Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_quantity > 25.0
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q32_semiadditive — semi-additive measure aggregation (the balance
  // semantics every finance warehouse needs: balances sum across
  // accounts but NOT across time — a month's value is its LAST
  // observation, not its sum): per (customer, month) keep the final
  // order's price via one ranked window, then sum those closing values
  // per month. The window and the month agg share the partition prefix,
  // so the plan pays one customer×month exchange, not two.
  def q32(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"), col("order_month"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(spark, dir)
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("order_month"))
      .agg(count(lit(1)).as("n_accounts"),
        dsum(col("o_totalprice")).as("sum_closing"))
      .orderBy(col("order_month"))
  }

  private val q32Sql =
    """WITH r AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS order_month, o_totalprice,
      |    ROW_NUMBER() OVER (
      |      PARTITION BY o_custkey, strftime(o_orderdate, '%Y-%m')
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders)
      |SELECT order_month, COUNT(*) AS n_accounts,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_closing
      |FROM r WHERE rn = 1
      |GROUP BY order_month ORDER BY order_month""".stripMargin

  // ---------------------------------------------------------------------
  // q33_lateral_topk — LATERAL correlated subquery (the "top-N related
  // rows per driving row" idiom SQL users reach for before window
  // functions): each high-balance customer pulls its 2 priciest orders
  // through a correlated ORDER BY ... LIMIT subquery. Catalyst
  // DECORRELATES the lateral relation — the per-row LIMIT becomes a
  // row_number window over one customer-partitioned sort of the inner
  // side joined back in bulk, NOT a per-customer re-execution — so what
  // runs at 100 TB is one shuffle of the (filtered) orders stream, the
  // same machinery q23 pins, reached through the planner's lateral-join
  // path that no other gate exercises. INNER lateral semantics drop
  // order-less customers on both engines.
  def q33(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c.c_custkey, c.c_acctbal, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c.c_acctbal > 9500.0
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  // ---------------------------------------------------------------------
  // q34_frequent_pairs — market-basket frequent-pair mining (the
  // support/lift step of association-rule learning) over order baskets.
  // Scale shape: the naive formulation is a lineitem×lineitem self-join
  // on orderkey — a shuffle whose output is quadratic in basket size and
  // that re-scans the fact twice. Here the fact is scanned ONCE into
  // per-order item sets (baskets are bounded — TPC-H ≤ 7 lines/order,
  // ≤ 12 in this data — so `collect_set` per order is O(1) state), and
  // the i<j pair fan-out happens MAP-SIDE inside one higher-order-
  // function projection; the only exchanges carry (pair, 1) partial
  // counts and the part-cardinality item supports. Lift stays in exact
  // BIGINT ppm (pair·orders·1e6 div n1·n2) so both engines hash-match
  // bit-for-bit. Top-100 by (support, pair) keeps the gate output
  // bounded at any sf via TakeOrderedAndProject, not a global sort.
  def q34(spark: SparkSession, dir: String): DataFrame = {
    // lazy localCheckpoint: four consumers (baskets→pairs, the order
    // count, and the two support broadcasts) each re-ran the
    // scan+distinct without it — broadcast builds reuse no exchange
    // (r9, the d26/globalRank finding). The order count also reads the
    // checkpointed items directly instead of re-running the basket
    // collect_set a second time (same scalar: #distinct orderkeys).
    val items = graft.Pins.pinForFanout(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct())
    val baskets = items
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val nOrders = items.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(parts, (x, i) ->
          |  transform(slice(parts, i + 2, size(parts)), y ->
          |    struct(x AS p1, y AS p2))))""".stripMargin)).as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(count(lit(1)).as("n_pair"))
    val itemSupport = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
    pairs
      .join(broadcast(itemSupport.withColumnRenamed("l_partkey", "p1")
        .withColumnRenamed("n_item", "n_p1")), "p1")
      .join(broadcast(itemSupport.withColumnRenamed("l_partkey", "p2")
        .withColumnRenamed("n_item", "n_p2")), "p2")
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("n_pair"), col("n_p1"), col("n_p2"),
        expr("(n_pair * n_orders * 1000000L) div (n_p1 * n_p2)").as("lift_ppm"))
      .orderBy(col("n_pair").desc, col("p1"), col("p2"))
      .limit(100)
  }

  private val q34Sql =
    """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
      |pr AS (
      |  SELECT a.l_partkey AS p1, c.l_partkey AS p2, COUNT(*) AS n_pair
      |  FROM b a JOIN b c
      |    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      |  GROUP BY 1, 2),
      |it AS (SELECT l_partkey, COUNT(*) AS n_item FROM b GROUP BY 1)
      |SELECT p1, p2, n_pair,
      |  i1.n_item AS n_p1, i2.n_item AS n_p2,
      |  CAST((n_pair * n_orders * 1000000) // (i1.n_item * i2.n_item) AS BIGINT)
      |    AS lift_ppm
      |FROM pr JOIN it i1 ON pr.p1 = i1.l_partkey
      |        JOIN it i2 ON pr.p2 = i2.l_partkey
      |        CROSS JOIN n
      |ORDER BY n_pair DESC, p1, p2 LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // q35_running_distinct — cumulative distinct users per day (the DAU→
  // cumulative-reach curve). The naive form, COUNT(DISTINCT) OVER an
  // expanding frame, re-scans every prior day's users per output row
  // (quadratic, and Spark refuses DISTINCT in a window anyway). The
  // scale-correct rewrite: a user contributes to the cumulative count
  // exactly once — on their FIRST day — so one groupBy(user) min(day)
  // pass reduces the fact to user-cardinality, the per-day new-user
  // counts are day-cardinality, and the expanding sum runs over the
  // tiny day grid. Exchanges carry (user, first_day) then (day, n) —
  // never (day, user) pairs.
  def q35(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        date_format(timestamp_micros(
          graft.streaming.Streaming.tsMicros(col("ts"))), "yyyy-MM-dd").as("day"))
    val firstSeen = e.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val newPerDay = firstSeen.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("n_new"))
    val grid = e.select(col("day")).distinct()
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(newPerDay, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_users", sum(col("n_new")).over(w))
      .orderBy(col("day"))
  }

  private val q35Sql =
    """WITH e AS (
      |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
      |  FROM events WHERE user_id IS NOT NULL),
      |f AS (SELECT user_id, MIN(day) AS first_day FROM e GROUP BY 1),
      |nw AS (SELECT first_day AS day, COUNT(*) AS n_new FROM f GROUP BY 1),
      |g AS (SELECT DISTINCT day FROM e)
      |SELECT g.day, COALESCE(n_new, 0) AS n_new,
      |  CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY g.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_users
      |FROM g LEFT JOIN nw ON g.day = nw.day ORDER BY g.day""".stripMargin

  private val q33Sql =
    """SELECT c.c_custkey, c.c_acctbal, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c.c_acctbal > 9500.0
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  private val q30Sql =
    """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  COUNT(DISTINCT o_custkey) AS n_cust
      |FROM orders
      |WHERE year(o_orderdate) = 1996 AND quarter(o_orderdate) = 2
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private val q25Sql =
    """WITH c AS (
      |  SELECT c_nationkey, COUNT(*) AS n_cust,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS cust_bal
      |  FROM customer WHERE c_acctbal > 9000.0 GROUP BY c_nationkey),
      |s AS (
      |  SELECT s_nationkey, COUNT(*) AS n_supp,
      |    CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS supp_bal
      |  FROM supplier WHERE s_acctbal > 9000.0 GROUP BY s_nationkey)
      |SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
      |  COALESCE(n_cust, 0) AS n_cust, cust_bal,
      |  COALESCE(n_supp, 0) AS n_supp, supp_bal
      |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // q37_drawdown — running-peak / maximum-drawdown per product over the
  // signed shipment balance (returns negative): the risk/deficit metric
  // form of cumulative analytics. Deliberately the PURE-WINDOW
  // counterpart to x20's clamped roll-forward: cumsum, running max of
  // the cumsum, and max(peak − cum) are all linear window algebra, so
  // the whole thing is ONE partkey exchange and one ordered pass —
  // no typed escape hatch needed, and at 100× the per-key frames stream
  // through a single sort. Quantities are integral → exact longs.
  def q37(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        when(col("l_returnflag") === "R", -col("l_quantity").cast("long"))
          .otherwise(col("l_quantity").cast("long")).as("delta"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("cum", sum(col("delta")).over(ord))
      .withColumn("peak", max(col("cum")).over(ord))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"),
        max(col("peak")).as("peak"),
        max(col("peak") - col("cum")).as("max_drawdown"),
        // final balance = total delta (order-free, unlike last(cum))
        sum(col("delta")).as("final_cum"))
      .orderBy(col("l_partkey"))
  }

  private val q37Sql =
    """WITH d AS (
      |  SELECT l_partkey,
      |    CASE WHEN l_returnflag = 'R' THEN -CAST(l_quantity AS BIGINT)
      |         ELSE CAST(l_quantity AS BIGINT) END AS delta,
      |    l_shipdate, l_orderkey, l_linenumber
      |  FROM lineitem),
      |c1 AS (
      |  SELECT l_partkey, delta, l_shipdate, l_orderkey, l_linenumber,
      |    CAST(SUM(delta) OVER (PARTITION BY l_partkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM d),
      |c2 AS (
      |  SELECT l_partkey, delta, cum,
      |    CAST(MAX(cum) OVER (PARTITION BY l_partkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
      |  FROM c1)
      |SELECT l_partkey, COUNT(*) AS n, MAX(peak) AS peak,
      |  CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown,
      |  CAST(SUM(delta) AS BIGINT) AS final_cum
      |FROM c2 GROUP BY l_partkey ORDER BY l_partkey""".stripMargin

  // ---------------------------------------------------------------------
  // q38_mode — per-group MODE (most frequent value, ties to the smallest
  // value): the categorical summary statistic. Never a sort of the raw
  // rows: one (nation, segment) partial-count aggregate — segment
  // cardinality per nation, not customers — then a 5-row-per-nation
  // rank window picks the winner. The count aggregate absorbs the data
  // volume map-side; at 100× the window input is unchanged.
  def q38(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("cnt").desc, col("c_mktsegment"))
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_segments",
        count(lit(1)).over(Window.partitionBy(col("c_nationkey"))))
      .filter(col("rn") === 1)
      .select(col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("mode_segment"),
        col("cnt").as("mode_count"), col("n_segments"))
      .orderBy(col("nationkey"))
  }

  private val q38Sql =
    """WITH c AS (
      |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
      |  FROM customer GROUP BY 1, 2),
      |r AS (
      |  SELECT c_nationkey, c_mktsegment, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |      ORDER BY cnt DESC, c_mktsegment) AS rn,
      |    COUNT(*) OVER (PARTITION BY c_nationkey) AS n_segments
      |  FROM c)
      |SELECT c_nationkey AS nationkey, c_mktsegment AS mode_segment,
      |  cnt AS mode_count, CAST(n_segments AS BIGINT) AS n_segments
      |FROM r WHERE rn = 1 ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // q39_quartiles — the exact INTERPOLATED percentile family
  // (percentile_cont semantics) without a float in sight: for quartile
  // q at 0-indexed position p = (n−1)·q/4, the answer interpolates
  // between ranks ⌊p⌋ and ⌈p⌉ with fraction (n−1)·q mod 4 quarters —
  // all integer, in millicents, so both engines agree bit-for-bit
  // (their native percentile_cont/quantile_cont would interpolate in
  // IEEE double with engine-specific association). One rank window per
  // nation + one conditional aggregate; q26 pins the exact median, this
  // pins the family. Values are cents (floor(acctbal·100)).
  def q39(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("cents"), col("c_custkey"))
    val ranked = Tables.customer(spark, dir)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") * 100).cast("long").as("cents"), col("c_custkey"))
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("c_nationkey"))))
    // exact integral divide (Column / is IEEE double division)
    def intDiv4(c: Column): Column = {
      import org.apache.spark.sql.GraftColumnBridge
      import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
      GraftColumnBridge.column(IntegralDivide(
        GraftColumnBridge.expression(c), Literal(4L))).cast("long")
    }
    def quartile(q: Int): Column = {
      val lo = expr(s"((n - 1) * $q) div 4")
      val frac = expr(s"((n - 1) * $q) % 4")
      val loV = max(when(col("rn") === lo, col("cents")))
      val hiV = max(when(col("rn") === lo + when(frac > 0, 1L).otherwise(0L),
        col("cents")))
      (loV * 1000L + intDiv4((hiV - loV) * lit(1000L) * max(frac))).cast("long")
    }
    ranked.groupBy(col("c_nationkey"))
      .agg(max(col("n")).as("n_cust"),
        quartile(1).as("q1_millicents"),
        quartile(2).as("q2_millicents"),
        quartile(3).as("q3_millicents"))
      .orderBy(col("c_nationkey"))
  }

  private val q39Sql =
    """WITH r AS (
      |  SELECT c_nationkey,
      |    CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |      ORDER BY CAST(floor(c_acctbal * 100) AS BIGINT), c_custkey) - 1 AS rn,
      |    COUNT(*) OVER (PARTITION BY c_nationkey) AS n
      |  FROM customer)
      |SELECT c_nationkey, CAST(MAX(n) AS BIGINT) AS n_cust,
      |  CAST(MAX(CASE WHEN rn = ((n-1) * 1) // 4 THEN cents END) * 1000
      |    + (MAX(CASE WHEN rn = ((n-1) * 1) // 4
      |          + CASE WHEN ((n-1) * 1) % 4 > 0 THEN 1 ELSE 0 END THEN cents END)
      |       - MAX(CASE WHEN rn = ((n-1) * 1) // 4 THEN cents END))
      |      * 1000 * MAX(((n-1) * 1) % 4) // 4 AS BIGINT) AS q1_millicents,
      |  CAST(MAX(CASE WHEN rn = ((n-1) * 2) // 4 THEN cents END) * 1000
      |    + (MAX(CASE WHEN rn = ((n-1) * 2) // 4
      |          + CASE WHEN ((n-1) * 2) % 4 > 0 THEN 1 ELSE 0 END THEN cents END)
      |       - MAX(CASE WHEN rn = ((n-1) * 2) // 4 THEN cents END))
      |      * 1000 * MAX(((n-1) * 2) % 4) // 4 AS BIGINT) AS q2_millicents,
      |  CAST(MAX(CASE WHEN rn = ((n-1) * 3) // 4 THEN cents END) * 1000
      |    + (MAX(CASE WHEN rn = ((n-1) * 3) // 4
      |          + CASE WHEN ((n-1) * 3) % 4 > 0 THEN 1 ELSE 0 END THEN cents END)
      |       - MAX(CASE WHEN rn = ((n-1) * 3) // 4 THEN cents END))
      |      * 1000 * MAX(((n-1) * 3) % 4) // 4 AS BIGINT) AS q3_millicents
      |FROM r GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // q44_listagg — ordered string aggregation (SQL LISTAGG / string_agg
  // WITHIN GROUP): the top-3 customers by account balance per nation,
  // concatenated in rank order. The naive shape — a per-group window
  // rank then string_agg — shuffles EVERY customer row to its nation's
  // partition; this plan ships only the ANSWER: the k-bounded
  // TopKAggregator reduces each nation to 3 (score, custkey) pairs
  // map-side, names attach by one equi-join whose probe side is
  // 3×nations rows, and the final concat sorts a ≤3-element array
  // in-row. Balance cents ride the aggregator's double score losslessly
  // (|cents| < 2^53). Nation names come from a broadcast dim join.
  def q44(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(graft.functions.TopKAggregator.TopK(3))
    val top = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_custkey"),
        floor(col("c_acctbal") * 100).cast("long").as("cents"))
      .groupBy(col("c_nationkey"))
      .agg(topk(col("cents").cast("double"), col("c_custkey")).as("t"))
      .select(col("c_nationkey"), posexplode(col("t")).as(Seq("pos", "e")))
      .select(col("c_nationkey"), (col("pos") + 1).cast("long").as("rk"),
        col("e.id").as("c_custkey"))
    top
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_name")),
        Seq("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rk"), col("c_name")))),
        x => x.getField("c_name")), ",").as("top_names"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
        Seq("c_nationkey"))
      .select(col("n_name"), col("top_names"))
      .orderBy(col("n_name"))
  }

  private val q44Sql =
    """WITH c AS (
      |  SELECT c_nationkey, c_custkey, c_name,
      |    CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |        ORDER BY cents DESC, c_custkey) AS rk FROM c)
      |SELECT n_name, string_agg(c_name, ',' ORDER BY rk) AS top_names
      |FROM r JOIN nation ON n_nationkey = c_nationkey
      |WHERE rk <= 3
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q45_local_volume — the TPC-H Q5 shape: revenue delivered by
  // LOCAL suppliers (customer and supplier in the same nation) per
  // nation of one region and one order-year — the canonical 6-table
  // join-ordering workout. The plan story is the point: lineitem is the
  // only fact-sized input; region→nation prunes to a 5-row build side,
  // customer/supplier joins shuffle on their keys, and Catalyst is free
  // to reorder because everything is declarative equi-joins. The
  // same-nation predicate rides the supplier join (c_nationkey =
  // s_nationkey), not a post-filter, so the join itself prunes.
  // Revenue = Σ extendedprice·(1−discount) through the DECIMAL(18,4)
  // dsum (deterministic across engines and partitionings).
  def q45(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  private val q45Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q46_returned_revenue — the TPC-H Q10 shape: top-20 customers by
  // revenue lost to returned items in one quarter. Fact-side: lineitem
  // filtered to returns joins orders filtered to the quarter (both
  // filters pushed to the scans), revenue aggregates per customer,
  // THEN the customer dim attaches — aggregate-before-join keeps the
  // dim join at customer-cardinality, and the final top-20 is a
  // TakeOrderedAndProject, not a global sort. Deterministic total
  // order: revenue is bucketed to exact cents for the ranking
  // (DECIMAL(18,4) compare is exact), tie-broken by custkey.
  def q46(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val per = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4)).as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("rev_exact"), count(lit(1)).as("n_returns"))
    per
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("rev_exact").cast(DoubleType).as("revenue"), col("n_returns"))
      .orderBy(col("rev_exact").desc, col("c_custkey"))
      .limit(20)
  }

  private val q46Sql =
    """WITH per AS (
      |  SELECT o_custkey,
      |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
      |      AS rev_exact,
      |    COUNT(*) AS n_returns
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT c_custkey, c_name, c_mktsegment,
      |  CAST(rev_exact AS DOUBLE) AS revenue, n_returns
      |FROM per JOIN customer ON o_custkey = c_custkey
      |ORDER BY rev_exact DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q49_null_semantics — pins SQL THREE-VALUED LOGIC on the NOT IN
  // null trap, the classic engine-compatibility hazard a user
  // migrating real SQL hits first: against the SAME null-polluted
  // membership set, NOT IN returns ZERO rows (any comparison with the
  // NULL element is UNKNOWN, so no row can prove non-membership) while
  // NOT EXISTS returns the real complement (the NULL row simply never
  // equals anything). Both counts in one result row — the gate fails
  // if either engine "helpfully" collapses the distinction.
  def q49(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("q49_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("q49_nation")
    spark.sql(
      """WITH s AS (
        |  SELECT n_nationkey AS k FROM q49_nation WHERE n_regionkey = 2
        |  UNION ALL SELECT CAST(NULL AS INT))
        |SELECT
        |  (SELECT COUNT(*) FROM q49_customer
        |   WHERE c_nationkey NOT IN (SELECT k FROM s)) AS not_in_with_null,
        |  (SELECT COUNT(*) FROM q49_customer c
        |   WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.k = c.c_nationkey))
        |    AS not_exists_with_null""".stripMargin)
  }

  private val q49Sql =
    """WITH s AS (
      |  SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 2
      |  UNION ALL SELECT CAST(NULL AS INT))
      |SELECT
      |  (SELECT COUNT(*) FROM customer
      |   WHERE c_nationkey NOT IN (SELECT k FROM s)) AS not_in_with_null,
      |  (SELECT COUNT(*) FROM customer c
      |   WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.k = c.c_nationkey))
      |    AS not_exists_with_null""".stripMargin

  // ---------------------------------------------------------------------
  // q60_ntile_cume — pins the BUILT-IN ntile / cume_dist / lag window
  // trio cross-engine (the rank-family members q23 doesn't cover):
  // customers ranked within their market segment by order count.
  // ntile's remainder convention (first n mod k tiles get the extra
  // row) and cume_dist's peer-group semantics are classic
  // engine-compatibility hazards — the ordering here is made total
  // (count desc, custkey) so cume_dist = rank/n exactly, a small-integer
  // ratio that divides to the same IEEE double in both engines. Scale
  // note: the window partitions by SEGMENT (5 groups) — fine for the
  // compatibility gate it is; the scalable quantile path is q40's
  // arithmetic rank bucketing over globalRank.
  def q60(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("seg")).orderBy(col("n").desc, col("c_custkey"))
    per.select(col("seg"), col("c_custkey"), col("n"),
        ntile(4).over(w).cast("long").as("quartile"),
        cume_dist().over(w).as("cume"),
        lag(col("n"), 1).over(w).as("prev_n"))
      .orderBy(col("seg"), col("c_custkey"))
  }

  private val q60Sql =
    """WITH per AS (
      |  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1)
      |SELECT c_mktsegment AS seg, c_custkey, n,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  cume_dist() OVER w AS cume,
      |  lag(n, 1) OVER w AS prev_n
      |FROM per JOIN customer ON o_custkey = c_custkey
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY n DESC, c_custkey)
      |ORDER BY seg, c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q69_topk_per_group — top-3 orders per customer via a rank-filter
  // window, written in the shape Spark's InferWindowGroupLimit rule
  // recognizes (`row_number() OVER (PARTITION ...) <= k` filter): the
  // planner inserts a WindowGroupLimit node that keeps only each
  // group's top k rows BEFORE the window sort's shuffle, so the
  // exchange carries k rows per customer instead of every order — at
  // 100 TB that is the difference between shuffling the fact table and
  // shuffling a bounded per-key sample. PlanRegressionSpec pins the
  // WindowGroupLimit node's presence so a rewrite can't silently lose
  // the pushdown. Ordering made total (price cents desc, orderkey) so
  // row_number is engine-deterministic.
  def q69(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("cents").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey").as("custkey"), col("rn"),
        col("o_orderkey").as("orderkey"), col("cents"))
      .orderBy(col("custkey"), col("rn"))
  }

  private val q69Sql =
    """SELECT o_custkey AS custkey, rn, o_orderkey AS orderkey, cents
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC,
      |        o_orderkey) AS BIGINT) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY custkey, rn""".stripMargin

  // ---------------------------------------------------------------------
  // q70_percentile_cont — EXACT interpolated percentiles (the
  // PERCENTILE_CONT convention: value = lo + (hi−lo)·frac at zero-based
  // position (n−1)·p/100) for p ∈ {50, 90, 99} over order totals,
  // entirely in integer micro-cents — engines' float percentile
  // implementations disagree in the last ulp, so the interpolation is
  // done by hand on BIGINTs: frac has denominator 100 by construction,
  // making lo·10^6 + (hi−lo)·frac100·10^4 exact on both sides. Scale
  // shape: ranks come from globalRank (range partitions + offsets, no
  // single-reducer window); the three (p, rank) targets are a 3-row
  // broadcast probed INTO the ranked scan twice (lo + hi) — Spark's
  // exchange reuse dedups the ranked subtree, and the exchanges carry
  // 3 rows past the probe. The naive form — orderBy().limit(rank) per
  // percentile — re-sorts the table per p.
  def q70(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.orders(spark, dir).select(
      floor(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_orderkey"))
    val ranked = globalRank(cents,
      Seq(col("cents").asc, col("o_orderkey").asc), "rn")
      .select(col("rn"), col("cents"))
    val n = cents.agg(count(lit(1)).as("n"))
    val ps = spark.range(1)
      .select(explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
      .crossJoin(broadcast(n)) // 1-row total ride-along
      .select(col("p"),
        (expr("(n - 1) * p div 100") + lit(1L)).as("lo_rank"),
        (expr("(n - 1) * p div 100") +
          when(expr("(n - 1) * p % 100") > 0, 2L).otherwise(1L)).as("hi_rank"),
        expr("(n - 1) * p % 100").as("frac100"))
    val lo = ranked.join(broadcast(ps), col("rn") === col("lo_rank"))
      .select(col("p"), col("frac100"), col("hi_rank"),
        col("cents").as("lo_cents"))
    ranked.select(col("rn").as("hrn"), col("cents").as("hi_cents"))
      .join(broadcast(lo), col("hrn") === col("hi_rank"))
      .select(col("p"),
        (col("lo_cents") * 1000000L +
          (col("hi_cents") - col("lo_cents")) * col("frac100") * 10000L)
          .as("value_micro_cents"))
      .orderBy(col("p"))
  }

  private val q70Sql =
    """WITH v AS (
      |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    o_orderkey
      |  FROM orders),
      |r AS (SELECT cents,
      |    ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rn FROM v),
      |n AS (SELECT COUNT(*) AS n FROM v),
      |p AS (SELECT unnest([50, 90, 99]) AS p),
      |s AS (SELECT p.p,
      |    (n.n - 1) * p.p // 100 + 1 AS lo_rank,
      |    (n.n - 1) * p.p // 100 +
      |      CASE WHEN (n.n - 1) * p.p % 100 > 0 THEN 2 ELSE 1 END AS hi_rank,
      |    (n.n - 1) * p.p % 100 AS frac100
      |  FROM p CROSS JOIN n)
      |SELECT CAST(s.p AS BIGINT) AS p,
      |  CAST(lo.cents * 1000000 + (hi.cents - lo.cents) * s.frac100 * 10000
      |    AS BIGINT) AS value_micro_cents
      |FROM s JOIN r lo ON lo.rn = s.lo_rank JOIN r hi ON hi.rn = s.hi_rank
      |ORDER BY p""".stripMargin

  // ---------------------------------------------------------------------
  // q71_quantified_all — quantified-comparison subqueries (`> ALL`),
  // which Spark does not parse: the exact three-valued rewrite is
  // pinned against DuckDB's NATIVE correlated `> ALL` — the q49-class
  // migration-semantics gate for the quantifier family. Semantics:
  // x > ALL(S) is FALSE iff some non-null s has x <= s, else NULL iff S
  // contains NULL, else TRUE (empty S included). The rewrite needs only
  // the reference set's per-group (count, null-count, max-of-non-null)
  // aggregate — nation-cardinality, BROADCAST into the probe scan — so
  // the quantifier costs one dim-sized aggregate, not a correlated
  // per-row subquery. All three outcome paths are live in the data:
  // empty reference nations → TRUE, NULLIF-masked balances (custkey %
  // 50) → NULL, dominated probes → FALSE; the gate tallies the
  // trichotomy per nation, so any deviation from ANSI quantifier logic
  // flips a count and fails the hash.
  def q71(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"),
      col("c_nationkey").cast("long").as("nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") * 100).cast("long").as("bal"))
    val refAgg = c.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("nationkey"),
        when(col("c_custkey") % 50 === 0, lit(null).cast("long"))
          .otherwise(col("bal")).as("rb"))
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("rb").isNull, 1L).otherwise(0L)).as("n_nullv"),
        max(col("rb")).as("mx"))
    c.filter(col("c_mktsegment") === "MACHINERY")
      .join(broadcast(refAgg), Seq("nationkey"), "left")
      .withColumn("v",
        when(coalesce(col("cnt"), lit(0L)) === 0L, lit(true))
          .when(col("bal") <= col("mx"), lit(false))
          .when(col("n_nullv") > 0L, lit(null).cast("boolean"))
          .otherwise(lit(true)))
      .groupBy(col("nationkey"))
      .agg(sum(when(col("v") === true, 1L).otherwise(0L)).as("n_true"),
        sum(when(col("v") === false, 1L).otherwise(0L)).as("n_false"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"))
      .orderBy(col("nationkey"))
  }

  private val q71Sql =
    """WITH c AS (
      |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
      |    c_mktsegment, CAST(floor(c_acctbal * 100) AS BIGINT) AS bal
      |  FROM customer),
      |ref AS (
      |  SELECT nationkey AS nk,
      |    CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE bal END AS rb
      |  FROM c WHERE c_mktsegment = 'AUTOMOBILE'),
      |p AS (
      |  SELECT nationkey, bal,
      |    bal > ALL (SELECT rb FROM ref WHERE ref.nk = c.nationkey) AS v
      |  FROM c WHERE c_mktsegment = 'MACHINERY')
      |SELECT nationkey,
      |  CAST(SUM(CASE WHEN v THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
      |  CAST(SUM(CASE WHEN NOT v THEN 1 ELSE 0 END) AS BIGINT) AS n_false,
      |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_quantified_all" -> (q71 _),
    "q70_percentile_cont" -> (q70 _),
    "q69_topk_per_group" -> (q69 _),
    "q60_ntile_cume" -> (q60 _),
    "q49_null_semantics" -> (q49 _),
    "q45_local_volume" -> (q45 _),
    "q46_returned_revenue" -> (q46 _),
    "q44_listagg" -> (q44 _),
    "q39_quartiles" -> (q39 _),
    "q37_drawdown" -> (q37 _),
    "q38_mode" -> (q38 _),
    "q33_lateral_topk" -> (q33 _),
    "q34_frequent_pairs" -> (q34 _),
    "q35_running_distinct" -> (q35 _),
    "q28_hopping_windows" -> (q28 _),
    "q29_equidepth_hist" -> (q29 _),
    "q30_dpp_star" -> (q30 _),
    "q31_bucketed_join" -> (q31 _),
    "q32_semiadditive" -> (q32 _),
    "q27_setops_all" -> (q27 _),
    "q26_median_disc" -> (q26 _),
    "q25_outer_join" -> (q25 _),
    "q24_unpivot" -> (q24 _),
    "q21_rolling_window" -> (q21 _),
    "q22_corr_subquery" -> (q22 _),
    "q23_rank_family" -> (q23 _),
    "q1_agg" -> (q1 _),
    "q2_filter_project" -> (q2 _),
    "q3_join_broadcast" -> (q3 _),
    "q4_semi_join" -> (q4 _),
    "q5_anti_join" -> (q5 _),
    "q6_distinct" -> (q6 _),
    "q7_topk" -> (q7 _),
    "q8_window" -> (q8 _),
    "q9_setops" -> (q9 _),
    "q10_rollup" -> (q10 _),
    "q11_case_bucket" -> (q11 _),
    "q12_agg_join" -> (q12 _),
    "q13_dates" -> (q13 _),
    "q14_json" -> (q14 _),
    "q15_strings" -> (q15 _),
    "q16_sql" -> (q16 _),
    "q17_cube" -> (q17 _),
    "q18_pivot" -> (q18 _),
    "q19_percentiles" -> (q19 _),
    "q20_grouping_sets" -> (q20 _))

  val oracleSql: Map[String, String] = Map(
    "q71_quantified_all" -> q71Sql,
    "q70_percentile_cont" -> q70Sql,
    "q69_topk_per_group" -> q69Sql,
    "q60_ntile_cume" -> q60Sql,
    "q49_null_semantics" -> q49Sql,
    "q45_local_volume" -> q45Sql,
    "q46_returned_revenue" -> q46Sql,
    "q44_listagg" -> q44Sql,
    "q39_quartiles" -> q39Sql,
    "q37_drawdown" -> q37Sql,
    "q38_mode" -> q38Sql,
    "q33_lateral_topk" -> q33Sql,
    "q34_frequent_pairs" -> q34Sql,
    "q35_running_distinct" -> q35Sql,
    "q28_hopping_windows" -> q28Sql,
    "q29_equidepth_hist" -> q29Sql,
    "q30_dpp_star" -> q30Sql,
    "q31_bucketed_join" -> q31Sql,
    "q32_semiadditive" -> q32Sql,
    "q27_setops_all" -> q27Sql,
    "q26_median_disc" -> q26Sql,
    "q25_outer_join" -> q25Sql,
    "q24_unpivot" -> q24Sql,
    "q21_rolling_window" -> q21Sql,
    "q22_corr_subquery" -> q22Sql,
    "q23_rank_family" -> q23Sql,
    "q1_agg" -> q1Sql,
    "q2_filter_project" -> q2Sql,
    "q3_join_broadcast" -> q3Sql,
    "q4_semi_join" -> q4Sql,
    "q5_anti_join" -> q5Sql,
    "q6_distinct" -> q6Sql,
    "q7_topk" -> q7Sql,
    "q8_window" -> q8Sql,
    "q9_setops" -> q9Sql,
    "q10_rollup" -> q10Sql,
    "q11_case_bucket" -> q11Sql,
    "q12_agg_join" -> q12Sql,
    "q13_dates" -> q13Sql,
    "q14_json" -> q14Sql,
    "q15_strings" -> q15Sql,
    "q16_sql" -> q16Sql,
    "q17_cube" -> q17Sql,
    "q18_pivot" -> q18Sql,
    "q19_percentiles" -> q19Sql,
    "q20_grouping_sets" -> q20Sql)
}
