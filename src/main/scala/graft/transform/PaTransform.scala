package graft.transform

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PA (Price Advisor) pipeline
  * (`/root/reference/src/pa/pa_etl_script.py:224-317`), rebuilt as a
  * distributed Spark plan. The reference runs this single-node in pandas;
  * shape here is identical to the price-zone plan so it scales the same
  * way.
  *
  * Semantic divergences from pandas (documented per SURVEY.md §7.4):
  * `pd.to_numeric` / `strptime` RAISE on junk; our engine flags and
  * counts instead (try_cast/try_to_timestamp null → counted invalid),
  * which is the engine-consistent behavior.
  */
object PaTransform {

  /** Cluster routing outcome (J1): per-cluster frames plus the
    * invalid-or-inactive opco set
    * (`pa_etl_script.py:85-101,275-277`). */
  final case class Routed(
      byCluster: Map[String, DataFrame],
      invalidOrInactive: DataFrame)

  /** Column transform (`pa_etl_script.py:243-264`):
    * drop CURRENT_PRICE/REASON/NEW_PRICE; rename ITEM_ID→supc,
    * LOCAL_REFERENCE_PRICE→price, ITEM_ATTR_5_NM→catch_weight_indicator;
    * EFFECTIVE_DATE → date part (X7); EXPORT_DATE → epoch seconds (X8);
    * PRICE_ZONE_ID 'NNN-Z' → opco_id + price_zone_id (X9); fixed output
    * column order (P6 — load-bearing for the positional DB load).
    */
  def transform(raw: DataFrame): DataFrame =
    raw
      .drop("CURRENT_PRICE", "REASON", "NEW_PRICE")
      .select(
        col("ITEM_ID").as("supc"),
        date_format(
          try_to_timestamp(substring_index(col("EFFECTIVE_DATE"), " ", 1), lit("yyyy-MM-dd")),
          "yyyy-MM-dd").as("effective_date"),
        col("LOCAL_REFERENCE_PRICE").as("price"),
        unix_timestamp(
          try_to_timestamp(col("EXPORT_DATE"), lit("yyyy-MM-dd HH:mm:ss"))).as("export_date"),
        col("ITEM_ATTR_5_NM").as("catch_weight_indicator"),
        split(col("PRICE_ZONE_ID"), "-").getItem(1).as("price_zone_id"),
        split(col("PRICE_ZONE_ID"), "-").getItem(0).as("opco_id"))

  /** F10 — price validation: count of rows with numeric price <= 0
    * (`pa_etl_script.py:202-209`; count-only, rows are NOT removed). */
  def invalidPriceCount(df: DataFrame, column: String = "price"): Long =
    df.filter(expr(s"try_cast($column AS DOUBLE)") <= lit(0.0)).count()

  /** J1 — route by opco→cluster mapping (broadcast dimension join) and
    * active-membership; the invalid bucket is mapped-but-inactive or
    * unmapped (`pa_etl_script.py:85-101` + duplicate impl
    * `/root/reference/src/FetchFileListLambda/index.py:75-118`).
    *
    * `mapping(opco_id, cluster_id)` is dimension-sized → broadcast; the
    * fact side never shuffles for routing. */
  def route(df: DataFrame, mapping: DataFrame, activeOpcos: Seq[String],
      clusters: Seq[String] = Seq("01", "02")): Routed = {
    val m = broadcast(mapping.select(
      col("opco_id").as("_m_opco"), col("cluster_id").as("_m_cluster")))
    val joined = df.join(m, col("opco_id") === col("_m_opco"), "left")
    val active = col("opco_id").isin(activeOpcos: _*)
    val byCluster = clusters.map { cid =>
      cid -> joined
        .filter(col("_m_cluster") === lit(cid) && active)
        .drop("_m_opco", "_m_cluster")
    }.toMap
    val invalid = joined
      .filter(col("_m_cluster").isNull || !col("_m_cluster").isin(clusters: _*) || !active)
      .select(col("opco_id")).distinct()
    Routed(byCluster, invalid)
  }

  /** End-to-end: pipe CSV in → transform → route → per-opco partitioned
    * CSV per cluster (`pa_etl_script.py:104-296` distributed). Returns
    * (total record count, invalid price count) — the metadata payload of
    * `pa_etl_script.py:298-314`. */
  def runFile(
      spark: SparkSession,
      inputPath: String,
      outputPathByCluster: String => String,
      mapping: DataFrame,
      activeOpcos: Seq[String]): (Long, Long) = {
    val df = transform(graft.sources.CsvSources.pipe(spark, inputPath))
    val badPrice = invalidPriceCount(df)
    val routed = route(df, mapping, activeOpcos)
    routed.byCluster.foreach { case (cid, frame) =>
      graft.sinks.PartitionedCsvSink.write(
        frame, outputPathByCluster(cid), Seq("opco_id"))
    }
    (df.count(), badPrice)
  }
}
