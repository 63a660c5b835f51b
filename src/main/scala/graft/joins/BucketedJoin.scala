package graft.joins

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables for co-located joins — the standing
  * answer to "this fact-fact join shuffles 100 TB every night".
  *
  * `bucketBy(n, key)` at write time hash-partitions rows into n files
  * per partition by the join key and records the layout in the catalog.
  * A later equi-join between two tables bucketed on the same key with
  * the same n reads bucket i of each side into the same task: the join
  * plans with NO Exchange on either side (verified by
  * `BucketedJoinSpec`), turning every repeated join/aggregation on that
  * key from a full shuffle into a local merge.
  *
  * When to bucket: keys joined repeatedly across jobs (doc_id, user_id,
  * orderkey). Write cost is one shuffle — paid once, not per query.
  * Bucket count rule of thumb: total data / bucket ≈ 100–200 MB at the
  * target scale; both sides MUST use identical n (Spark joins bucketed
  * tables shuffle-free only on equal counts, or multiples with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object BucketedJoin {

  /** Persist `df` as a parquet table bucketed + sorted by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two same-key, same-count bucketed tables (shuffle-free). */
  def join(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
