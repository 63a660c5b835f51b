package graft.schema

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** Typed records + StructTypes for the engine's core datasets
  * (SURVEY.md §1.3: fixed, header-named schemas applied explicitly —
  * never inferred). Case classes give compile-time field checks on the
  * typed paths (`Dataset[T]`, mapPartitions codecs); the StructTypes are
  * the single source of truth for readers.
  */
object Schemas {

  /** Price-zone raw CSV contract (pre-mapping,
    * `/root/reference/src/price_zone/transform_spark_job.py:54-58`). */
  final case class PriceZoneRaw(
      co_nbr: String, supc: String, prc_zone: String,
      cust_nbr: String, eff_from_dttm: String)

  /** Post-mapping validated record (typed finalize output; price_zone
    * int per `transform_spark_job.py:78`, effective_date rendered
    * seconds-precision per `:104`). */
  final case class PriceZoneRecord(
      opco_id: String, supc: String, price_zone: Option[Int],
      customer_id: String, effective_date: Option[String])

  /** PA output contract in load-bearing column order
    * (`/root/reference/src/pa/pa_etl_script.py:264`). */
  final case class PaPriceRecord(
      supc: String, effective_date: Option[String], price: String,
      export_date: Option[Long], catch_weight_indicator: String,
      price_zone_id: String, opco_id: String)

  /** PA raw export contract (pre-transform, pipe CSV, all-string —
    * the column set `PaTransform.transform` consumes/drops;
    * `/root/reference/src/pa/pa_etl_script.py:243-264`). */
  final case class PaRaw(
      ITEM_ID: String, PRICE_ZONE_ID: String, EFFECTIVE_DATE: String,
      LOCAL_REFERENCE_PRICE: String, EXPORT_DATE: String,
      ITEM_ATTR_5_NM: String, CURRENT_PRICE: String, REASON: String,
      NEW_PRICE: String)

  /** Opco→cluster dimension (`pa_etl_script.py:15`). */
  final case class OpcoCluster(opco_id: String, cluster_id: String)

  val priceZoneRaw: StructType = Encoders.product[PriceZoneRaw].schema
  val paRaw: StructType = Encoders.product[PaRaw].schema
  val priceZoneRecord: StructType = Encoders.product[PriceZoneRecord].schema
  val paPriceRecord: StructType = Encoders.product[PaPriceRecord].schema
  val opcoCluster: StructType = Encoders.product[OpcoCluster].schema
}
