package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV scans (SURVEY.md §2.1 S1–S3). The reference reads everything as
  * string with no inference and casts selectively
  * (`/root/reference/src/price_zone/transform_spark_job.py:44-48`;
  * pipe-CSV with forced string dtypes
  * `/root/reference/src/pa/pa_etl_script.py:104-109`).
  *
  * Scale notes: Spark/Hadoop reads `.csv.gz` transparently, so the
  * reference's separate decompress job (S2,
  * `/root/reference/src/price_zone/decompress_job.py:20-30`) is not an
  * operator here — but a gz file is a single non-splittable partition,
  * so `repartitionAfterRead` exists to fan a big archive out to the
  * cluster before heavy downstream work.
  */
object CsvSources {

  /** S1 — comma CSV, header row, every column string (no inference). */
  def commaAllString(spark: SparkSession, path: String): DataFrame =
    spark.read.format("csv")
      .option("header", "true")
      .option("inferSchema", "false")
      .option("sep", ",")
      .load(path)

  /** S3 — pipe-delimited CSV, header row, explicit schema (all-string
    * unless a schema is supplied). */
  def pipe(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format("csv")
      .option("header", "true")
      .option("sep", "|")
    schema.fold(r.option("inferSchema", "false"))(s => r.schema(s)).load(path)
  }

  /** Post-read fan-out for non-splittable inputs (.gz): one partition in,
    * `n` out. No-op when the source already parallelized. */
  def repartitionAfterRead(df: DataFrame, n: Int): DataFrame =
    if (df.rdd.getNumPartitions < n) df.repartition(n) else df

  /** S1 variant with malformed-line capture: PERMISSIVE parse keeps bad
    * physical lines in `_corrupt_record` instead of failing the job —
    * the ingestion-side complement to the row-level validation rules
    * (the reference assumes clean CSV; at 100 TB that assumption always
    * breaks somewhere). Requires an explicit schema (all-string contract
    * plus the capture column). */
  def commaWithCorruptCapture(
      spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField}
    val schema = StructType(
      columns.map(StructField(_, StringType, nullable = true)) :+
        StructField("_corrupt_record", StringType, nullable = true))
    spark.read.format("csv")
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema)
      .load(path)
  }
}
