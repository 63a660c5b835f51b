package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkSpec

/** Multi-batch proof for the st23 streaming KMV sketch: the gate drains
  * in one AvailableNow batch, so it alone cannot distinguish a correct
  * incremental fold from a rescan. Here the events split into two files
  * by event_id parity (so each event type's users straddle batches, in
  * non-time order) processed one per micro-batch; the k-smallest-
  * distinct-hash state must carry across, and the final emission must
  * equal the BATCH sketch over all events — the order-independence that
  * makes the gate's estimate hash-checkable in the first place. */
class StreamKmvSpec extends SparkSpec {
  import spark.implicits._

  test("KMV state folds across micro-batches to the batch sketch") {
    val dir = "/root/testdata/sf0.001"
    val src = graft.Tables.events(spark, dir)
    val in = Files.createTempDirectory("kmv_in").toString
    src.filter($"event_id" % 2 === 0).coalesce(1)
      .write.mode("append").parquet(in)
    src.filter($"event_id" % 2 === 1).coalesce(1)
      .write.mode("append").parquet(in)

    val k = 16 // small enough that the buffer fills and truncates
    val events = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .filter($"user_id".isNotNull)
      .select($"event_type",
        ((($"user_id" % 67108864L) * 2654435761L) % 4294967296L).as("hv"))
      .as[(String, Long)]

    val name = "kmv_multibatch_sink"
    val q = Streaming.kmvFold(events, k).toDF()
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 2, s"expected >=2 data micro-batches, saw $batches")

    val got = spark.table(name)
      .groupBy($"event_type")
      .agg(max(struct($"n_seen", $"kth_hash", $"kk")).as("m"))
      .select($"event_type", $"m.kth_hash", $"m.kk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq

    val expect = src.filter($"user_id".isNotNull)
      .select($"event_type",
        ((($"user_id" % 67108864L) * 2654435761L) % 4294967296L).as("hv"))
      .distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"hv")))
      .filter($"rn" <= k)
      .groupBy($"event_type")
      .agg(max($"hv").as("kth"), count(lit(1)).as("kk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq

    assert(got == expect,
      s"streaming KMV diverged from batch sketch: got=$got expect=$expect")
    spark.catalog.dropTempView(name)
    org.apache.spark.sql.GraftStreamingBridge.unloadAllStateStores()
  }
}
