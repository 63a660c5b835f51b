package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.Tables
import graft.transform.PriceZoneTransform
import graft.validate.{Rules, Validator}

/** The validation library (SURVEY.md §2.3 F1–F9) wired into the driver's
  * correctness gate. Input is a deterministic "price zone file" synthesized
  * from lineitem — same expressions on the Spark and DuckDB side — then the
  * REAL library (`graft.validate`) runs on top and the oracle re-states the
  * rule predicates in SQL.
  *
  * Corruption pattern (all mod-based, so identical in both engines). Each
  * corruption targets ONE opco (s = l_suppkey % 12) so that group-level
  * attribution is observable: opcos 000–005 each fail a different rule,
  * 006/007 survive, 008–011 are inactive:
  *   - s=0, l_orderkey % 97 == 0 → non-numeric customer_id ("X…")
  *   - s=1, l_orderkey % 89 == 0 → 15-char customer_id (over limit)
  *   - s=2, l_partkey  % 83 == 0 → empty supc
  *   - s=3, l_partkey  % 79 == 0 → non-numeric price_zone
  *   - s=4, l_orderkey % 59 == 0 → price_zone 9, out of [1,5]
  *   - s=5, l_partkey  % 53 == 0 → calendar-invalid datetime (regex passes)
  *   - s=0, l_partkey  % 41 == 0 → wrong date format (regex fails)
  *   - s ∈ {8..11}               → inactive opco
  */
object ValidationQueries {

  val activeOpcos: Seq[String] = (0 to 7).map(i => f"$i%03d")

  /** Synthesized raw price-zone frame (all-string, like the CSV contract). */
  def synth(spark: SparkSession, dir: String): DataFrame = {
    val s = col("l_suppkey") % 12
    Tables.lineitem(spark, dir).select(
      lpad(s.cast(StringType), 3, "0").as("opco_id"),
      when(s === 0 && col("l_orderkey") % 97 === 0,
        concat(lit("X"), col("l_orderkey").cast(StringType)))
        .when(s === 1 && col("l_orderkey") % 89 === 0, lit("999999999999999"))
        .otherwise(col("l_orderkey").cast(StringType)).as("customer_id"),
      when(s === 2 && col("l_partkey") % 83 === 0, lit(""))
        .otherwise(col("l_partkey").cast(StringType)).as("supc"),
      when(s === 3 && col("l_partkey") % 79 === 0, lit("z"))
        .when(s === 4 && col("l_orderkey") % 59 === 0, lit("9"))
        .otherwise(((col("l_linenumber") - 1) % 5 + 1).cast(StringType)).as("price_zone"),
      when(s === 5 && col("l_partkey") % 53 === 0, lit("2020-02-30 10:00:00"))
        .when(s === 0 && col("l_partkey") % 41 === 0, lit("2020/08/06 00:00:00"))
        .when(col("l_orderkey") % 3 === 0, lit("2020-08-06 00:00:00.123456"))
        .otherwise(lit("2020-08-06 00:00:00")).as("eff_from_dttm"))
  }

  private val synthSql =
    """SELECT
      |  lpad(CAST(l_suppkey % 12 AS VARCHAR), 3, '0') AS opco_id,
      |  CASE WHEN l_suppkey % 12 = 0 AND l_orderkey % 97 = 0 THEN 'X' || CAST(l_orderkey AS VARCHAR)
      |       WHEN l_suppkey % 12 = 1 AND l_orderkey % 89 = 0 THEN '999999999999999'
      |       ELSE CAST(l_orderkey AS VARCHAR) END AS customer_id,
      |  CASE WHEN l_suppkey % 12 = 2 AND l_partkey % 83 = 0 THEN '' ELSE CAST(l_partkey AS VARCHAR) END AS supc,
      |  CASE WHEN l_suppkey % 12 = 3 AND l_partkey % 79 = 0 THEN 'z'
      |       WHEN l_suppkey % 12 = 4 AND l_orderkey % 59 = 0 THEN '9'
      |       ELSE CAST((l_linenumber - 1) % 5 + 1 AS VARCHAR) END AS price_zone,
      |  CASE WHEN l_suppkey % 12 = 5 AND l_partkey % 53 = 0 THEN '2020-02-30 10:00:00'
      |       WHEN l_suppkey % 12 = 0 AND l_partkey % 41 = 0 THEN '2020/08/06 00:00:00'
      |       WHEN l_orderkey % 3 = 0 THEN '2020-08-06 00:00:00.123456'
      |       ELSE '2020-08-06 00:00:00' END AS eff_from_dttm
      |FROM lineitem""".stripMargin

  /** The nine rule predicates re-stated in DuckDB SQL, aligned with
    * PriceZoneTransform.rules ordering. */
  private val activeList = activeOpcos.map(o => s"'$o'").mkString(", ")
  private val dateRegexSql = Rules.DateFormatRegex // no quotes inside — safe to inline
  private val flagsSql =
    s"""SELECT *,
       |  (customer_id IS NULL OR customer_id = '' OR regexp_matches(customer_id, '[^0-9]')) AS f_cust_num,
       |  (supc IS NULL OR supc = '' OR regexp_matches(supc, '[^0-9]')) AS f_supc_num,
       |  (price_zone IS NULL OR price_zone = '' OR regexp_matches(price_zone, '[^0-9]')) AS f_pz_num,
       |  (eff_from_dttm IS NULL OR NOT regexp_matches(eff_from_dttm, '$dateRegexSql')) AS f_date_fmt,
       |  COALESCE(length(customer_id) > 14, FALSE) AS f_cust_len,
       |  COALESCE(length(supc) > 9, FALSE) AS f_supc_len,
       |  (opco_id IS NULL OR opco_id NOT IN ($activeList)) AS f_member,
       |  COALESCE(TRY_CAST(price_zone AS INTEGER) < 1 OR TRY_CAST(price_zone AS INTEGER) > 5, FALSE) AS f_range,
       |  (try_strptime(split_part(eff_from_dttm, '.', 1), '%Y-%m-%d %H:%M:%S') IS NULL) AS f_parse
       |FROM input""".stripMargin

  private val anyFlagSql =
    "(f_cust_num OR f_supc_num OR f_pz_num OR f_date_fmt OR f_cust_len OR f_supc_len OR f_member OR f_range OR f_parse)"

  private def rules = PriceZoneTransform.rules(activeOpcos)

  // ---------------------------------------------------------------------
  // v1_rule_flags — per-rule violation totals in ONE pass (the redesign of
  // the reference's 14-scan pattern; SURVEY §4.1/§4.2).
  def v1(spark: SparkSession, dir: String): DataFrame = {
    val rs = rules
    val names = Seq("f_cust_num", "f_supc_num", "f_pz_num", "f_date_fmt",
      "f_cust_len", "f_supc_len", "f_member", "f_range", "f_parse")
    val aggs = rs.zip(names).map { case (r, n) =>
      sum(col(r.flagName).cast("long")).as(n)
    }
    Validator.flagged(synth(spark, dir), rs)
      .agg(aggs.head, aggs.tail: _*)
  }

  private val v1Sql =
    s"""WITH input AS ($synthSql), flags AS ($flagsSql)
       |SELECT
       |  CAST(SUM(CASE WHEN f_cust_num THEN 1 ELSE 0 END) AS BIGINT) AS f_cust_num,
       |  CAST(SUM(CASE WHEN f_supc_num THEN 1 ELSE 0 END) AS BIGINT) AS f_supc_num,
       |  CAST(SUM(CASE WHEN f_pz_num THEN 1 ELSE 0 END) AS BIGINT) AS f_pz_num,
       |  CAST(SUM(CASE WHEN f_date_fmt THEN 1 ELSE 0 END) AS BIGINT) AS f_date_fmt,
       |  CAST(SUM(CASE WHEN f_cust_len THEN 1 ELSE 0 END) AS BIGINT) AS f_cust_len,
       |  CAST(SUM(CASE WHEN f_supc_len THEN 1 ELSE 0 END) AS BIGINT) AS f_supc_len,
       |  CAST(SUM(CASE WHEN f_member THEN 1 ELSE 0 END) AS BIGINT) AS f_member,
       |  CAST(SUM(CASE WHEN f_range THEN 1 ELSE 0 END) AS BIGINT) AS f_range,
       |  CAST(SUM(CASE WHEN f_parse THEN 1 ELSE 0 END) AS BIGINT) AS f_parse
       |FROM flags""".stripMargin

  // ---------------------------------------------------------------------
  // v2_failed_groups — F9: distinct offending groups across all rules.
  def v2(spark: SparkSession, dir: String): DataFrame = {
    val rs = rules
    Validator.failedGroups(Validator.flagged(synth(spark, dir), rs), rs, "opco_id")
      .orderBy(col("opco_id"))
  }

  private val v2Sql =
    s"""WITH input AS ($synthSql), flags AS ($flagsSql)
       |SELECT DISTINCT opco_id FROM flags WHERE $anyFlagSql ORDER BY opco_id""".stripMargin

  // ---------------------------------------------------------------------
  // v3_valid_by_opco — F8 group removal, then survivor stats per group.
  def v3(spark: SparkSession, dir: String): DataFrame =
    Validator.validRows(synth(spark, dir), rules, "opco_id")
      .groupBy(col("opco_id"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("customer_id")).as("n_customers"))
      .orderBy(col("opco_id"))

  private val v3Sql =
    s"""WITH input AS ($synthSql), flags AS ($flagsSql),
       |failed AS (SELECT DISTINCT opco_id FROM flags WHERE $anyFlagSql)
       |SELECT i.opco_id, COUNT(*) AS n, COUNT(DISTINCT customer_id) AS n_customers
       |FROM input i WHERE i.opco_id NOT IN (SELECT opco_id FROM failed)
       |GROUP BY i.opco_id ORDER BY i.opco_id""".stripMargin

  // ---------------------------------------------------------------------
  // v4_final_records — the full §7.2 slice: validate → remove → finalize
  // (typed price_zone, effective_date derived, source column dropped).
  def v4(spark: SparkSession, dir: String): DataFrame =
    PriceZoneTransform.finalize(
      Validator.validRows(synth(spark, dir), rules, "opco_id"))
      .orderBy(col("opco_id"), col("supc"), col("customer_id"),
        col("price_zone"), col("effective_date"))

  private val v4Sql =
    s"""WITH input AS ($synthSql), flags AS ($flagsSql),
       |failed AS (SELECT DISTINCT opco_id FROM flags WHERE $anyFlagSql)
       |SELECT opco_id, supc, TRY_CAST(price_zone AS INTEGER) AS price_zone, customer_id,
       |  strftime(try_strptime(split_part(eff_from_dttm, '.', 1), '%Y-%m-%d %H:%M:%S'),
       |           '%Y-%m-%d %H:%M:%S') AS effective_date
       |FROM input WHERE opco_id NOT IN (SELECT opco_id FROM failed)
       |ORDER BY opco_id, supc, customer_id, price_zone, effective_date""".stripMargin

  // ---------------------------------------------------------------------
  // v5_pa_route — the PA pipeline shape (X9 composite-key split + J1
  // broadcast cluster routing) on synthesized input.
  def v5(spark: SparkSession, dir: String): DataFrame = {
    val pa = Tables.lineitem(spark, dir).select(
      col("l_partkey").cast(StringType).as("supc"),
      concat(lpad((col("l_suppkey") % 12).cast(StringType), 3, "0"),
        lit("-"), col("l_linenumber").cast(StringType)).as("PRICE_ZONE_ID"))
      .select(
        col("supc"),
        split(col("PRICE_ZONE_ID"), "-").getItem(0).as("opco_id"),
        split(col("PRICE_ZONE_ID"), "-").getItem(1).as("price_zone_id"))
    // dimension: opco NNN → cluster 01/02 by parity (deterministic inline)
    val mapping = spark.range(12).select(
      lpad(col("id").cast(StringType), 3, "0").as("m_opco"),
      when(col("id") % 2 === 0, lit("01")).otherwise(lit("02")).as("cluster_id"))
    // two-level distinct: a multi-countDistinct aggregate Expands every
    // input row once per distinct column; pre-aggregating to the
    // (cluster, opco, supc) grain first shrinks the expand input from
    // |records| to |distinct triples| (map-side combined)
    pa.join(broadcast(mapping), col("opco_id") === col("m_opco"))
      .filter(col("opco_id").isin(activeOpcos: _*))
      .groupBy(col("cluster_id"), col("opco_id"), col("supc"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("cluster_id"))
      .agg(sum(col("c")).cast("long").as("n_records"),
        countDistinct(col("opco_id")).as("n_opcos"),
        countDistinct(col("supc")).as("n_supcs"))
      .orderBy(col("cluster_id"))
  }

  private val v5Sql =
    s"""WITH pa AS (
       |  SELECT CAST(l_partkey AS VARCHAR) AS supc,
       |    split_part(lpad(CAST(l_suppkey % 12 AS VARCHAR), 3, '0') || '-' || CAST(l_linenumber AS VARCHAR), '-', 1) AS opco_id,
       |    split_part(lpad(CAST(l_suppkey % 12 AS VARCHAR), 3, '0') || '-' || CAST(l_linenumber AS VARCHAR), '-', 2) AS price_zone_id
       |  FROM lineitem),
       |mapping AS (
       |  SELECT lpad(CAST(i AS VARCHAR), 3, '0') AS m_opco,
       |    CASE WHEN i % 2 = 0 THEN '01' ELSE '02' END AS cluster_id
       |  FROM range(12) t(i))
       |SELECT cluster_id, COUNT(*) AS n_records,
       |  COUNT(DISTINCT opco_id) AS n_opcos, COUNT(DISTINCT supc) AS n_supcs
       |FROM pa JOIN mapping ON opco_id = m_opco
       |WHERE opco_id IN ($activeList)
       |GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  // ---------------------------------------------------------------------
  // v6_roundtrip — the partitioned CSV SINK inside the hash-checked
  // gate: validate → finalize → write partitionBy(opco_id) CSV (header,
  // quoting off, partition column elided — the reference's S4/S5
  // contract) → read the directory back all-string → aggregate. The
  // oracle computes the same stats straight from the validated rows,
  // so ANY round-trip loss (quoting, null/empty rendering, partition-
  // column type mangling, dropped rows) breaks the hash. Partition
  // values come back type-inferred ('007' → 7), so the key is
  // re-padded — exactly the inverse the loader's path-regex extraction
  // performs in the reference (`FetchFileListLambda/index.py:100-102`).
  def v6(spark: SparkSession, dir: String): DataFrame = {
    val valid = PriceZoneTransform.finalize(
      Validator.validRows(synth(spark, dir), rules, "opco_id"))
    val tmp = graft.control.Scratch.dir("graft_v6_roundtrip")
    // singleFilePerGroup: the reference's S5 one-CSV-per-opco contract
    // (pa_etl_script.py groupby→to_csv), and 8 files instead of
    // tasks×partitions splinters on the read-back
    graft.sinks.PartitionedCsvSink.write(valid, tmp, Seq("opco_id"),
      singleFilePerGroup = true)
    val back = spark.read.option("header", "true").csv(tmp)
    back.groupBy(lpad(col("opco_id").cast(StringType), 3, "0").as("opco_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("supc").cast("long")).as("sum_supc"),
        sum(col("customer_id").cast("long")).as("sum_customer"),
        countDistinct(col("price_zone")).as("n_zones"),
        min(col("effective_date")).as("min_eff"),
        max(col("effective_date")).as("max_eff"))
      .orderBy(col("opco_id"))
  }

  private val v6Sql =
    s"""WITH input AS ($synthSql), flags AS ($flagsSql),
       |failed AS (SELECT DISTINCT opco_id FROM flags WHERE $anyFlagSql),
       |final AS (
       |  SELECT opco_id, supc, customer_id,
       |    TRY_CAST(price_zone AS INTEGER) AS price_zone,
       |    strftime(try_strptime(split_part(eff_from_dttm, '.', 1), '%Y-%m-%d %H:%M:%S'),
       |             '%Y-%m-%d %H:%M:%S') AS effective_date
       |  FROM input WHERE opco_id NOT IN (SELECT opco_id FROM failed))
       |SELECT opco_id, COUNT(*) AS n,
       |  CAST(SUM(CAST(supc AS BIGINT)) AS BIGINT) AS sum_supc,
       |  CAST(SUM(CAST(customer_id AS BIGINT)) AS BIGINT) AS sum_customer,
       |  COUNT(DISTINCT price_zone) AS n_zones,
       |  MIN(effective_date) AS min_eff, MAX(effective_date) AS max_eff
       |FROM final GROUP BY opco_id ORDER BY opco_id""".stripMargin

  // ---------------------------------------------------------------------
  // v7_orc_roundtrip — the OTHER columnar format (§2.1 breadth beyond
  // CSV/parquet): documents → partitioned ORC write (one directory per
  // source) → read back → per-source stats. The oracle computes the
  // same stats straight from the parquet table, so any round-trip loss
  // (type mangling, partition-value re-typing, dropped rows, encoding)
  // breaks the hash. DuckDB cannot read ORC — the round-trip-vs-origin
  // equality IS the check, same pattern as v6's CSV round trip. ORC
  // scans support the same predicate pushdown as parquet
  // (Round4OperatorsSpec pins PushedFilters on the read-back).
  def v7(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val tmp = graft.control.Scratch.dir("graft_v7_orc")
    docs.write.mode("overwrite").partitionBy("source").orc(tmp)
    spark.read.orc(tmp)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(md5(col("text"))).as("n_distinct"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"))
  }

  private val v7Sql =
    """SELECT source, COUNT(*) AS n,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  COUNT(DISTINCT md5(text)) AS n_distinct,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // v8_json_roundtrip — JSON-lines source + sink (§2.1 breadth: the
  // interchange format of every ingestion pipeline): documents →
  // partitioned JSON-lines write → schema-pinned read-back →
  // per-source stats, oracled against the parquet origin like v6/v7.
  // Two JSON-specific hazards this pins: (a) read-back uses the
  // ORIGINAL schema, not inference — inference would widen/reorder
  // types and, at 100 TB, pay a full extra pass over the data;
  // (b) text survives JSON string escaping byte-exactly (the md5
  // distinct-count breaks on any mangling). lang rides as a data
  // column; source is the partition column, re-typed on read — its
  // use as a group key pins that re-typing too.
  def v8(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val tmp = graft.control.Scratch.dir("graft_v8_json")
    docs.write.mode("overwrite").partitionBy("source").json(tmp)
    val back = spark.read.schema(docs.schema).json(tmp)
    back.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(md5(col("text"))).as("n_distinct"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"), col("lang"))
  }

  private val v8Sql =
    """SELECT source, lang, COUNT(*) AS n,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  COUNT(DISTINCT md5(text)) AS n_distinct,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin

  // ---------------------------------------------------------------------
  // v9_schema_evolution — schema-evolved parquet read (§2.1 breadth: a
  // 100 TB corpus is never written under one schema; ingestion epochs
  // add columns and reorder fields, and the reader must resolve BY NAME
  // across file vintages). Epoch-1 files carry the original 3-column
  // schema; epoch-2 files add `lang` AND deliberately reorder the
  // shared columns — `mergeSchema=true` must (a) union the schemas,
  // (b) null-fill the missing column in old files, (c) bind columns by
  // name, not position. The gate aggregates across both vintages so any
  // positional mis-bind or fill error breaks the hash. The oracle
  // restates the union (write+read of each vintage is identity, per the
  // v6/v7/v8 round-trip contracts).
  // Scale note: mergeSchema's footer union is a file-listing pass, not
  // a data pass — the read itself stays one pruned columnar scan.
  def v9(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val tmp = graft.control.Scratch.dir("graft_v9_evo")
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/epoch1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("lang"), col("doc_id"), col("n_chars"), col("source"))
      .write.mode("overwrite").parquet(s"$tmp/epoch2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$tmp/epoch1", s"$tmp/epoch2")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        count(col("lang")).as("n_with_lang"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"))
  }

  private val v9Sql =
    """WITH u AS (
      |  SELECT doc_id, source, n_chars, NULL AS lang
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id, source, n_chars, lang
      |  FROM documents WHERE doc_id % 2 = 1)
      |SELECT source, COUNT(*) AS n, COUNT(lang) AS n_with_lang,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM u GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // v10_profile — whole-table column profiler (graft.validate.Profiler):
  // per column of orders, one pass computes row count, null count,
  // distinct count, and collation min/max through a string cast — the
  // "do I trust this drop" report every ingest runs before validation
  // rules are even chosen. The oracle restates it as one SELECT per
  // column UNION ALLed (the classic hand-rolled form the one-pass
  // operator replaces). Timestamps here are all-midnight and doubles
  // plain-decimal, so the two engines' string renderings agree exactly.
  def v10(spark: SparkSession, dir: String): DataFrame =
    graft.validate.Profiler.profile(
      Tables.orders(spark, dir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))

  private val v10Sql = {
    val one = (c: String) =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  COUNT(DISTINCT CAST($c AS VARCHAR)) AS n_distinct,
         |  MIN(CAST($c AS VARCHAR)) AS min_s,
         |  MAX(CAST($c AS VARCHAR)) AS max_s
         |FROM orders""".stripMargin
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ---------------------------------------------------------------------
  // v11_badrecords — malformed-record ROUTING on the CSV ingest path:
  // a deterministic slice of rows (l_orderkey % 101 == 0) is written
  // with an unparseable quantity field, the read runs PERMISSIVE with a
  // corrupt-record column, and the gate attributes good/bad counts per
  // return flag — bad rows keep their parseable fields (flag) while the
  // broken field nulls out, so quarantined rows stay attributable
  // instead of vanishing (the reference's validation jobs route bad
  // rows to error output; dropping them silently is the ingest
  // anti-pattern). The oracle knows the corruption pattern from the
  // generating table and restates the tallies directly — bit-equal
  // tallies prove the CSV writer, the permissive parser, and the
  // routing agree on every row.
  def v11(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val tmp = graft.control.Scratch.dir("graft_v11_bad")
    Tables.lineitem(spark, dir)
      .select(concat_ws(",",
        col("l_returnflag"),
        when(col("l_orderkey") % 101 === 0, lit("XX"))
          .otherwise(col("l_quantity").cast(StringType)),
        col("l_orderkey").cast(StringType)).as("value"))
      .write.mode("overwrite").text(tmp)
    val schema = StructType(Seq(
      StructField("flag", StringType), StructField("qty", DoubleType),
      StructField("okey", LongType), StructField("_corrupt", StringType)))
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(tmp)
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_bad"),
        sum(col("qty").cast("decimal(18,4)")).cast("double").as("sum_qty"))
      .orderBy(col("flag"))
  }

  private val v11Sql =
    """SELECT l_returnflag AS flag, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN l_orderkey % 101 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bad,
      |  CAST(SUM(CASE WHEN l_orderkey % 101 = 0 THEN NULL
      |               ELSE CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE)
      |    AS sum_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // v12_fd_discovery — functional-dependency discovery over candidate
  // column pairs (the profiling step that finds keys and derivable
  // columns before schema design): for each candidate lhs→rhs, group by
  // lhs, count distinct rhs per key, and report how many lhs keys
  // violate (distinct rhs > 1). holds=true means the data supports the
  // dependency (o_orderkey→o_custkey: a key determines everything;
  // month→quarter: derivable; priority→status: independent). Each
  // candidate is one partial-aggregated groupBy — per-pair plans union
  // at the end, so at 100 TB the candidate sweeps share nothing and
  // schedule independently.
  def v12(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .withColumn("order_quarter",
        concat(year(col("o_orderdate")), lit("-Q"), quarter(col("o_orderdate"))))
    val candidates = Seq(
      ("o_orderkey", "o_custkey"),
      ("order_month", "order_quarter"),
      ("o_orderpriority", "o_orderstatus"),
      ("o_custkey", "o_orderpriority"))
    candidates.map { case (lhs, rhs) =>
      orders.groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("nd"))
        .agg(
          count(lit(1)).as("n_keys"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_keys"), col("n_violating"),
          (col("n_violating") === 0L).as("holds"))
    }.reduce(_.unionAll(_)).orderBy(col("lhs"), col("rhs"))
  }

  private val v12Sql = {
    val one = (lhs: String, rhs: String) =>
      s"""SELECT '$lhs' AS lhs, '$rhs' AS rhs,
         |  COUNT(*) AS n_keys,
         |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
         |  (SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0) AS holds
         |FROM (SELECT $lhs, COUNT(DISTINCT $rhs) AS nd FROM o GROUP BY $lhs)""".stripMargin
    """WITH o AS (
      |  SELECT *, strftime(o_orderdate, '%Y-%m') AS order_month,
      |    CAST(year(o_orderdate) AS VARCHAR) || '-Q'
      |      || CAST(quarter(o_orderdate) AS VARCHAR) AS order_quarter
      |  FROM orders)
      |""".stripMargin +
      Seq(("o_orderkey", "o_custkey"), ("order_month", "order_quarter"),
        ("o_orderpriority", "o_orderstatus"), ("o_custkey", "o_orderpriority"))
        .map { case (l, r) => one(l, r) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY lhs, rhs")
  }

  // ---------------------------------------------------------------------
  // v13_kanon — k-anonymity suppression (the privacy gate a dataset
  // passes before release): every row must sit in an equivalence class
  // of ≥ k on its quasi-identifiers (nation, market segment). Classes
  // below k generalize the most-identifying column (nation → '*') and
  // re-pool by segment alone; pools still below k fall through to the
  // fully-suppressed ('*','*') class. The cascade is two cheap
  // aggregates over the CLASS-COUNT table (|nations|×|segments| rows),
  // not over rows — at 100 TB the only row-sized pass is the first
  // groupBy, everything after is driver-trivial and shuffle-free. No
  // row is dropped: the three tiers partition the population, so
  // sum(n) always equals count(*) — the invariant the oracle's hash
  // pins at every sf (small sfs exercise all three tiers, large sfs
  // may leave the '*' tiers empty, and both engines must agree).
  def v13(spark: SparkSession, dir: String): DataFrame = {
    val k = 5L
    val g1 = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    val tier1 = g1.filter(col("n") >= k)
      .select(col("c_nationkey").cast("string").as("qi_nation"),
        col("c_mktsegment").as("qi_segment"), col("n"))
    val g2 = g1.filter(col("n") < k)
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("n")).as("n"))
    val tier2 = g2.filter(col("n") >= k)
      .select(lit("*").as("qi_nation"), col("c_mktsegment").as("qi_segment"),
        col("n"))
    val tier3 = g2.filter(col("n") < k)
      .agg(sum(col("n")).as("n"))
      .filter(col("n").isNotNull)
      .select(lit("*").as("qi_nation"), lit("*").as("qi_segment"), col("n"))
    tier1.unionAll(tier2).unionAll(tier3)
      .orderBy(col("qi_nation"), col("qi_segment"))
  }

  private val v13Sql =
    """WITH g1 AS (
      |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
      |  FROM customer GROUP BY 1, 2),
      |small AS (SELECT * FROM g1 WHERE n < 5),
      |g2 AS (
      |  SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS n
      |  FROM small GROUP BY 1)
      |SELECT CAST(c_nationkey AS VARCHAR) AS qi_nation,
      |  c_mktsegment AS qi_segment, n
      |FROM g1 WHERE n >= 5
      |UNION ALL
      |SELECT '*', c_mktsegment, n FROM g2 WHERE n >= 5
      |UNION ALL
      |SELECT '*', '*', n FROM (
      |  SELECT CAST(SUM(n) AS BIGINT) AS n FROM g2 WHERE n < 5)
      |WHERE n IS NOT NULL
      |ORDER BY qi_nation, qi_segment""".stripMargin

  // ---------------------------------------------------------------------
  // v14_partition_checksums — table-integrity checksums per partition:
  // an order-independent XOR signature + a modular sum of per-row
  // hashes, the reconcile primitive for verifying a 100 TB copy /
  // migration / lake sync WITHOUT moving the data (ship per-partition
  // signatures, compare driver-side). Row hash = md5 over a canonical
  // '|'-joined projection (nulls coalesced, long text pre-hashed so
  // the canonical string stays bounded); 15 hex chars → a positive
  // 60-bit long both engines parse identically. Scale shape: hashing
  // is map-side codegen; the ONLY exchange carries (source,
  // partial-xor, partial-sum) — commutative-associative aggregates, so
  // partition count and row order can differ between the two sides and
  // the signatures still match (that order-independence is the whole
  // point of the operator).
  def v14(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        conv(substring(md5(concat_ws("|",
          col("doc_id").cast(StringType), coalesce(col("lang"), lit("")),
          col("source"), col("n_chars").cast(StringType),
          md5(coalesce(col("text"), lit(""))))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_sig"),
        sum(col("h") % lit(1000000007L)).as("sum_sig"))
      .orderBy(col("source"))

  private val v14Sql =
    """WITH r AS (
      |  SELECT source,
      |    CAST(CAST(concat('0x', substr(md5(concat_ws('|',
      |      CAST(doc_id AS VARCHAR), COALESCE(lang, ''), source,
      |      CAST(n_chars AS VARCHAR), md5(COALESCE(text, '')))), 1, 15))
      |      AS UBIGINT) AS BIGINT) AS h
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_rows,
      |  CAST(bit_xor(h) AS BIGINT) AS xor_sig,
      |  CAST(SUM(h % 1000000007) AS BIGINT) AS sum_sig
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // v15_benford — Benford's-law first-digit screening over order values:
  // the fraud/synthetic-data smell test a QA layer runs on monetary
  // columns. Everything stays integral: cents = floor(price·100) in IEEE
  // double (identical across engines), the first significant digit comes
  // from the BIGINT's decimal string (integer→string is engine-stable;
  // double→string is NOT — that's why the cast happens after flooring),
  // observed shares are ppm by integer division, and the expected
  // Benford shares are pinned LITERAL ppm constants (log10 across
  // engines/libms is not bit-stable, so no runtime logs). One partial
  // count per digit — a 9-row result at any scale.
  def v15(spark: SparkSession, dir: String): DataFrame = {
    val expected = Seq(
      (1, 301030L), (2, 176091L), (3, 124939L), (4, 96910L), (5, 79181L),
      (6, 66947L), (7, 57992L), (8, 51153L), (9, 45757L))
    val exp = spark.createDataFrame(expected).toDF("digit", "exp_ppm")
    val digits = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    // total joins in separately so digits with zero rows still get a
    // non-null denominator
    val total = digits.agg(sum(col("n")).as("total"))
    broadcast(exp).join(digits, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        expr("(coalesce(n, 0L) * 1000000L) div total").as("obs_ppm"),
        col("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .withColumn("suspicious", abs(col("dev_ppm")) > 50000)
      .orderBy(col("digit"))
  }

  private val v15Sql =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit
      |  FROM (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |        FROM orders) WHERE cents > 0),
      |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
      |e(digit, exp_ppm) AS (VALUES
      |  (1, CAST(301030 AS BIGINT)), (2, 176091), (3, 124939), (4, 96910),
      |  (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757))
      |SELECT e.digit, COALESCE(c.n, 0) AS n,
      |  (COALESCE(c.n, 0) * 1000000) // total AS obs_ppm,
      |  e.exp_ppm,
      |  (COALESCE(c.n, 0) * 1000000) // total - e.exp_ppm AS dev_ppm,
      |  abs((COALESCE(c.n, 0) * 1000000) // total - e.exp_ppm) > 50000
      |    AS suspicious
      |FROM e LEFT JOIN c ON e.digit = c.digit CROSS JOIN t
      |ORDER BY e.digit""".stripMargin

  // ---------------------------------------------------------------------
  // v16_anomaly_mad — robust daily-volume anomaly detection
  // (median/MAD): the data-quality monitor that survives the outliers a
  // mean/stddev z-score is wrecked by. Events reduce to one count per
  // day FIRST (the only full-data pass); the median and the MAD are the
  // exact lower medians over the ≤hundreds-row day table via q26's
  // rank-at-ceil(n/2) — the single-partition windows run on day
  // cardinality, never on events. The 3·1.4826·MAD threshold is exact
  // integer cross-multiplication (|x−med|·10000 > 44478·MAD) — no float
  // in the flag.
  def v16(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = {
      import org.apache.spark.sql.GraftColumnBridge
      import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
      GraftColumnBridge.column(IntegralDivide(
        GraftColumnBridge.expression(graft.streaming.Streaming.tsMicros(col("ts"))),
        Literal(86400000000L))).cast("long")
    }
    val daily = Tables.events(spark, dir)
      .select(day.as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val wAll = Window.partitionBy(lit(1))
    def lowerMedian(df: DataFrame, valueCol: String, tieCol: String): DataFrame = {
      val w = Window.partitionBy(lit(1)).orderBy(col(valueCol), col(tieCol))
      df.withColumn("rn", row_number().over(w))
        .withColumn("m", count(lit(1)).over(wAll))
        .filter(col("rn") === expr("(m + 1) div 2"))
        .select(col(valueCol).as("median"))
    }
    val med = lowerMedian(daily, "cnt", "day")
    val withDev = daily.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("cnt") - col("median")))
    val mad = lowerMedian(
      withDev.select(col("dev").as("d"), col("day")), "d", "day")
      .select(col("median").as("mad"))
    withDev.crossJoin(broadcast(mad))
      .select(col("day"), col("cnt"), col("median").as("med"), col("mad"),
        (col("dev") * 10000 > col("mad") * 44478).as("is_anomaly"))
      .orderBy(col("day"))
  }

  private val v16Sql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS cnt
      |  FROM events GROUP BY 1),
      |r AS (
      |  SELECT day, cnt,
      |    ROW_NUMBER() OVER (ORDER BY cnt, day) AS rn,
      |    COUNT(*) OVER () AS m
      |  FROM daily),
      |med AS (SELECT cnt AS median FROM r WHERE rn = (m + 1) // 2),
      |dev AS (
      |  SELECT day, cnt, median, abs(cnt - median) AS dv
      |  FROM daily CROSS JOIN med),
      |r2 AS (
      |  SELECT dv, ROW_NUMBER() OVER (ORDER BY dv, day) AS rn,
      |    COUNT(*) OVER () AS m
      |  FROM dev),
      |mad AS (SELECT dv AS mad FROM r2 WHERE rn = (m + 1) // 2)
      |SELECT day, cnt, CAST(median AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
      |  abs(cnt - median) * 10000 > mad * 44478 AS is_anomaly
      |FROM dev CROSS JOIN mad
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // v17_ref_integrity — referential-integrity audit across the star
  // schema's FK edges: orphan counts for lineitem→orders,
  // lineitem→part, orders→customer, customer→nation. Each check is a
  // LEFT ANTI against the parent's key projection — the parent side is
  // keys only (never the wide row) and the small parents broadcast, so
  // the audit costs one pass per fact even at 100 TB. The relation name
  // is the row key, so adding FK edges is data, not schema.
  def v17(spark: SparkSession, dir: String): DataFrame = {
    // one pass per fact: LEFT JOIN against the parent's key projection
    // with a hit marker — checked total and orphan count come out of the
    // same aggregate, no driver-side action anywhere
    def orphans(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String, small: Boolean): DataFrame = {
      val p0 = parent.select(col(pkey).as(key)).distinct()
        .withColumn("hit", lit(1))
      val p = if (small) broadcast(p0) else p0
      child.select(col(key))
        .join(p, Seq(key), "left")
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col(key).isNotNull && col("hit").isNull, 1L).otherwise(0L))
            .as("n_orphans"))
        .select(lit(name).as("relation"), col("n_checked"), col("n_orphans"))
    }
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    orphans("lineitem_orders", li, "l_orderkey", o, "o_orderkey", small = false)
      .unionAll(orphans("lineitem_part", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey", small = true))
      .unionAll(orphans("orders_customer", o, "o_custkey", c, "c_custkey",
        small = true))
      .unionAll(orphans("customer_nation", c, "c_nationkey",
        Tables.nation(spark, dir), "n_nationkey", small = true))
      .orderBy(col("relation"))
  }

  private val v17Sql =
    """SELECT * FROM (
      |  SELECT 'lineitem_orders' AS relation,
      |    (SELECT COUNT(*) FROM lineitem) AS n_checked,
      |    (SELECT COUNT(*) FROM lineitem l
      |     WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
      |       (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |      AS n_orphans
      |  UNION ALL
      |  SELECT 'lineitem_part',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem l
      |     WHERE l.l_partkey IS NOT NULL AND NOT EXISTS
      |       (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
      |  UNION ALL
      |  SELECT 'orders_customer',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT COUNT(*) FROM orders o
      |     WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
      |       (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL
      |  SELECT 'customer_nation',
      |    (SELECT COUNT(*) FROM customer),
      |    (SELECT COUNT(*) FROM customer c
      |     WHERE c.c_nationkey IS NOT NULL AND NOT EXISTS
      |       (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)))
      |ORDER BY relation""".stripMargin

  // ---------------------------------------------------------------------
  // v28_jdbc_roundtrip — the S6 bulk-load dialect ORACLE-CHECKED end to
  // end (VERDICT r7 item 5): the reference's core sink is
  // `LOAD DATA ... REPLACE INTO TABLE`
  // (/root/reference/src/price_zone/load_job.py:74-84); here the
  // portable replace dialect (DeleteThenInsert — REPLACE's exact
  // sequential semantics for engines without the MySQL verb) executes
  // against a REAL SQL engine, embedded in-memory Derby, through the
  // distributed foreachPartition path: (1) DDL with a PRIMARY KEY,
  // (2) a base load of every customer, (3) a REFRESH load whose keys
  // all CONFLICT (customers that placed orders — the PK-conflict
  // REPLACE pass, with new values and a new audit stamp), (4) read
  // back through spark.read.jdbc. The DuckDB oracle recomputes the
  // same upsert end-state relationally (refresh overrides base), so
  // the dialect path is hash-checked, not just spec-asserted. Scale
  // shape: the sink is one connection per partition, batched
  // statements, one commit per partition — hash-repartitioned on the
  // PK so parallel partitions never contend on a row; Derby stands in
  // for the warehouse endpoint (the sink API takes any JDBC
  // connection factory).
  def v28(spark: SparkSession, dir: String): DataFrame = {
    import graft.sinks.{DerbyMem, DerbyMemConnFactory, JdbcReplaceSink => S}
    val db = "graft_v28"
    val table = "graft_v28_pz"
    val setup = DerbyMem.conn(db)
    try {
      val st = setup.createStatement()
      // rebuild per invocation: the gate must be idempotent across
      // repeated runs in one JVM (bench reruns, plan audits)
      try st.execute(s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => () }
      st.execute(
        s"""CREATE TABLE $table (
           |  custkey BIGINT NOT NULL PRIMARY KEY, nationkey BIGINT,
           |  acctbal_cents BIGINT, n_orders BIGINT, src VARCHAR(16),
           |  arrived_time VARCHAR(32))""".stripMargin)
      st.close()
    } finally setup.close()
    val cols = Seq("custkey", "nationkey", "acctbal_cents", "n_orders", "src")
    def cfg(arrived: String) = S.Config(
      table = table, columns = cols,
      auditColumns = Seq("arrived_time" -> arrived),
      batchSize = 256, dialect = S.DeleteThenInsert,
      keyColumns = Seq("custkey"))
    val cust = Tables.customer(spark, dir).select(
      col("c_custkey").as("custkey"),
      col("c_nationkey").cast("long").as("nationkey"),
      floor(col("c_acctbal") * 100).cast("long").as("acctbal_cents"))
    val base = cust.select(col("custkey"), col("nationkey"),
      col("acctbal_cents"), lit(0L).as("n_orders"), lit("base").as("src"))
    S.write(base.repartition(4, col("custkey")),
      cfg("2024-06-01 00:00:00"), new DerbyMemConnFactory(db))
    // refresh: per-customer order stats — every key conflicts with base
    val refresh = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        floor(max(col("o_totalprice")) * 100).cast("long").as("acctbal_cents"))
      .join(cust.select(col("custkey"), col("nationkey")), Seq("custkey"))
      .select(col("custkey"), col("nationkey"), col("acctbal_cents"),
        col("n_orders"), lit("refresh").as("src"))
    S.write(refresh.repartition(4, col("custkey")),
      cfg("2024-06-02 00:00:00"), new DerbyMemConnFactory(db))
    spark.read.format("jdbc")
      .option("url", DerbyMem.url(db))
      .option("driver", DerbyMem.driverClass)
      .option("dbtable", table)
      .load()
      .select(col("CUSTKEY").as("custkey"), col("NATIONKEY").as("nationkey"),
        col("ACCTBAL_CENTS").as("acctbal_cents"),
        col("N_ORDERS").as("n_orders"), col("SRC").as("src"),
        col("ARRIVED_TIME").as("arrived_time"))
      .orderBy(col("custkey"))
  }

  private val v28Sql =
    """WITH ref AS (
      |  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
      |    CAST(floor(MAX(o_totalprice) * 100) AS BIGINT) AS acctbal_cents
      |  FROM orders GROUP BY 1),
      |base AS (
      |  SELECT c_custkey AS custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
      |    CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents
      |  FROM customer)
      |SELECT b.custkey, b.nationkey,
      |  COALESCE(r.acctbal_cents, b.acctbal_cents) AS acctbal_cents,
      |  CAST(COALESCE(r.n_orders, 0) AS BIGINT) AS n_orders,
      |  CASE WHEN r.custkey IS NOT NULL THEN 'refresh' ELSE 'base' END AS src,
      |  CASE WHEN r.custkey IS NOT NULL THEN '2024-06-02 00:00:00'
      |       ELSE '2024-06-01 00:00:00' END AS arrived_time
      |FROM base b LEFT JOIN ref r ON b.custkey = r.custkey
      |ORDER BY b.custkey""".stripMargin

  // ---------------------------------------------------------------------
  // v29_stream_pipeline — the reference's WHOLE arriving-files pipeline
  // (S3 ObjectCreated → Lambda → Glue per file, re-expressed as
  // [[graft.streaming.PipelineStream]]) as an oracle-checked gate:
  // synthesized raw CSVs arrive ONE FILE PER OPCO, one file per
  // micro-batch (`maxFilesPerTrigger=1` — the one-job-per-file cadence
  // of the reference's trigger lambda), each batch runs
  // applyMapping → 9 rules → failed-GROUP removal → finalize →
  // partitioned idempotent CSV sink, and the landed layout is read
  // back through partition discovery and aggregated per opco. Because
  // every file holds exactly one opco's rows, the per-BATCH group
  // removal equals the GLOBAL removal, so the multi-batch streaming
  // result must hash-match v4's batch semantics — which is what the
  // oracle states over the same synthesized input. Staging, output and
  // checkpoint are cached per sf dir: a re-invocation (bench reruns)
  // drains ZERO new files off the same checkpoint and re-reads the
  // identical landed layout — the exactly-once path exercised on
  // every repeat. (The 12-iteration driver loop writes the arrival
  // files once per JVM; it stages test input, it is not an operator.)
  private val v29Dirs =
    scala.collection.mutable.Map.empty[String, (String, String, String)]

  def v29(spark: SparkSession, dir: String): DataFrame = {
    val (inDir, outDir, ckptDir) = v29Dirs.synchronized {
      v29Dirs.getOrElseUpdate(dir, {
        val in = graft.control.Scratch.dir("graft_v29_in")
        val out = graft.control.Scratch.dir("graft_v29_out")
        val ck = graft.control.Scratch.dir("graft_v29_ckpt")
        val raw = synth(spark, dir).select(
          col("opco_id").as("co_nbr"), col("supc"),
          col("price_zone").as("prc_zone"),
          col("customer_id").as("cust_nbr"), col("eff_from_dttm"))
        (0 until 12).foreach { i =>
          val o = f"$i%03d"
          val tmp = graft.control.Scratch.dir("graft_v29_stage")
          raw.filter(col("co_nbr") === lit(o)).coalesce(1)
            .write.mode("overwrite").option("header", "true").csv(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.endsWith(".csv"))
          part.foreach(f => java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(in, s"opco_$o.csv")))
        }
        (in, out, ck)
      })
    }
    graft.streaming.PipelineStream.runPriceZoneStream(
      spark, inDir, outDir, ckptDir, activeOpcos, maxFilesPerTrigger = Some(1))
    val back = spark.read.option("header", "true").csv(outDir)
    back.groupBy(lpad(col("opco_id").cast(StringType), 3, "0").as("opco_id"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("supc")).as("n_supcs"),
        min(col("effective_date")).as("min_eff"),
        max(col("effective_date")).as("max_eff"))
      .orderBy(col("opco_id"))
  }

  private val v29Sql =
    s"""WITH input AS ($synthSql), flags AS ($flagsSql),
       |failed AS (SELECT DISTINCT opco_id FROM flags WHERE $anyFlagSql),
       |final AS (
       |  SELECT opco_id, supc,
       |    strftime(try_strptime(split_part(eff_from_dttm, '.', 1), '%Y-%m-%d %H:%M:%S'),
       |             '%Y-%m-%d %H:%M:%S') AS effective_date
       |  FROM input WHERE opco_id NOT IN (SELECT opco_id FROM failed))
       |SELECT opco_id, COUNT(*) AS n_rows,
       |  COUNT(DISTINCT supc) AS n_supcs,
       |  MIN(effective_date) AS min_eff, MAX(effective_date) AS max_eff
       |FROM final GROUP BY opco_id ORDER BY opco_id""".stripMargin

  // ---------------------------------------------------------------------
  // v30_pa_stream — the PA route under the same arriving-files cadence
  // (VERDICT r8 item 5: v29 proved the price-zone pipeline one file per
  // micro-batch; this closes the second reference route,
  // `/root/reference/src/pa/pa_etl_script.py:224-317` driven at the
  // trigger lambda's one-job-per-file cadence). Synthesized pipe-CSV
  // exports (one file per opco, derived from lineitem exactly like v5)
  // arrive one per micro-batch through
  // [[graft.streaming.PipelineStream.runPaStream]]: transform →
  // invalid-price count → broadcast cluster routing → per-cluster
  // batch_id-scoped partitioned CSV (idempotent overwrite). The landed
  // two-cluster layout is read back through partition discovery and
  // aggregated per (cluster, opco); because routing is row-wise
  // stateless, the multi-batch result must equal the global batch
  // semantics the oracle states directly over lineitem. Dirs are cached
  // per sf: re-invocations drain ZERO files off the same checkpoint and
  // re-read the identical layout — v29's exactly-once rerun property.
  private val v30Dirs =
    scala.collection.mutable.Map.empty[String, (String, String, String)]

  def v30(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.lineitem(spark, dir).select(
      col("l_partkey").cast(StringType).as("ITEM_ID"),
      concat(lpad((col("l_suppkey") % 12).cast(StringType), 3, "0"),
        lit("-"), col("l_linenumber").cast(StringType)).as("PRICE_ZONE_ID"),
      concat(col("l_shipdate").cast(StringType), lit(" 00:00:00"))
        .as("EFFECTIVE_DATE"),
      // integer cents rendered as string: float-rendering differences
      // between engines can never reach the hash
      floor(col("l_extendedprice") * 100).cast("long").cast(StringType)
        .as("LOCAL_REFERENCE_PRICE"),
      concat(col("l_shipdate").cast(StringType), lit(" 08:30:00"))
        .as("EXPORT_DATE"),
      col("l_returnflag").as("ITEM_ATTR_5_NM"),
      lit("0").as("CURRENT_PRICE"), lit("NA").as("REASON"),
      lit("0").as("NEW_PRICE"))
    val (inDir, outDir, ckptDir) = v30Dirs.synchronized {
      v30Dirs.getOrElseUpdate(dir, {
        val in = graft.control.Scratch.dir("graft_v30_in")
        val out = graft.control.Scratch.dir("graft_v30_out")
        val ck = graft.control.Scratch.dir("graft_v30_ckpt")
        (0 until 12).foreach { i =>
          val o = f"$i%03d"
          val tmp = graft.control.Scratch.dir("graft_v30_stage")
          raw.filter(split(col("PRICE_ZONE_ID"), "-").getItem(0) === lit(o))
            .coalesce(1)
            .write.mode("overwrite").option("header", "true")
            .option("sep", "|").csv(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.endsWith(".csv"))
          part.foreach(f => java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(in, s"pa_export_$o.csv")))
        }
        (in, out, ck)
      })
    }
    val mapping = spark.range(12).select(
      lpad(col("id").cast(StringType), 3, "0").as("opco_id"),
      when(col("id") % 2 === 0, lit("01")).otherwise(lit("02"))
        .as("cluster_id"))
    graft.streaming.PipelineStream.runPaStream(
      spark, inDir, outDir, ckptDir, mapping, activeOpcos,
      maxFilesPerTrigger = Some(1))
    val back = spark.read.option("header", "true").csv(outDir)
    back.groupBy(
        lpad(col("cluster").cast(StringType), 2, "0").as("cluster_id"),
        lpad(col("opco_id").cast(StringType), 3, "0").as("opco_id"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col("supc")).as("n_supcs"),
        countDistinct(col("price_zone_id")).as("n_zones"),
        min(col("effective_date")).as("min_eff"),
        max(col("effective_date")).as("max_eff"),
        sum(col("price").cast("long")).as("price_cents"))
      .orderBy(col("cluster_id"), col("opco_id"))
  }

  private val v30Sql =
    s"""WITH pa AS (
       |  SELECT CAST(l_partkey AS VARCHAR) AS supc,
       |    lpad(CAST(l_suppkey % 12 AS VARCHAR), 3, '0') AS opco_id,
       |    CAST(l_linenumber AS VARCHAR) AS price_zone_id,
       |    strftime(l_shipdate, '%Y-%m-%d') AS effective_date,
       |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_cents
       |  FROM lineitem),
       |mapping AS (
       |  SELECT lpad(CAST(i AS VARCHAR), 3, '0') AS m_opco,
       |    CASE WHEN i % 2 = 0 THEN '01' ELSE '02' END AS cluster_id
       |  FROM range(12) t(i))
       |SELECT m.cluster_id, p.opco_id, COUNT(*) AS n_records,
       |  COUNT(DISTINCT p.supc) AS n_supcs,
       |  COUNT(DISTINCT p.price_zone_id) AS n_zones,
       |  MIN(p.effective_date) AS min_eff, MAX(p.effective_date) AS max_eff,
       |  CAST(SUM(p.price_cents) AS BIGINT) AS price_cents
       |FROM pa p JOIN mapping m ON p.opco_id = m.m_opco
       |WHERE p.opco_id IN ($activeList)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v30_pa_stream" -> (v30 _),
    "v29_stream_pipeline" -> (v29 _),
    "v28_jdbc_roundtrip" -> (v28 _),
    "v17_ref_integrity" -> (v17 _),
    "v15_benford" -> (v15 _),
    "v16_anomaly_mad" -> (v16 _),
    "v13_kanon" -> (v13 _),
    "v14_partition_checksums" -> (v14 _),
    "v12_fd_discovery" -> (v12 _),
    "v11_badrecords" -> (v11 _),
    "v10_profile" -> (v10 _),
    "v9_schema_evolution" -> (v9 _),
    "v8_json_roundtrip" -> (v8 _),
    "v7_orc_roundtrip" -> (v7 _),
    "v1_rule_flags" -> (v1 _),
    "v2_failed_groups" -> (v2 _),
    "v3_valid_by_opco" -> (v3 _),
    "v4_final_records" -> (v4 _),
    "v5_pa_route" -> (v5 _),
    "v6_roundtrip" -> (v6 _))

  val oracleSql: Map[String, String] = Map(
    "v30_pa_stream" -> v30Sql,
    "v28_jdbc_roundtrip" -> v28Sql,
    "v29_stream_pipeline" -> v29Sql,
    "v17_ref_integrity" -> v17Sql,
    "v15_benford" -> v15Sql,
    "v16_anomaly_mad" -> v16Sql,
    "v13_kanon" -> v13Sql,
    "v14_partition_checksums" -> v14Sql,
    "v12_fd_discovery" -> v12Sql,
    "v11_badrecords" -> v11Sql,
    "v10_profile" -> v10Sql,
    "v1_rule_flags" -> v1Sql,
    "v2_failed_groups" -> v2Sql,
    "v3_valid_by_opco" -> v3Sql,
    "v4_final_records" -> v4Sql,
    "v5_pa_route" -> v5Sql,
    "v6_roundtrip" -> v6Sql,
    "v7_orc_roundtrip" -> v7Sql,
    "v8_json_roundtrip" -> v8Sql,
    "v9_schema_evolution" -> v9Sql)
}
