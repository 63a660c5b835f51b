package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkSpec

/** Multi-batch proof for the st22 streaming funnel: the gate drains the
  * whole directory in one AvailableNow batch, so on its own it cannot
  * distinguish "correct incremental fold" from "rescans everything".
  * Here the events split into two files processed one per micro-batch
  * (`maxFilesPerTrigger=1`), with the split chosen so each user's
  * history straddles batches — the conditional-min state must carry
  * across, and the consumer's latest-row selection (max monotone n)
  * must supersede batch-1 rows. The expected result is the BATCH funnel
  * over all events; any state loss or stale-row selection diverges.
  *
  * The split is by event_id parity, NOT time order — so batch 2
  * routinely delivers events EARLIER than batch 1's (the out-of-order
  * arrival that can create or destroy v<c<p), exercising the flip path
  * the operator's doc promises.
  */
class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  test("funnel state folds across micro-batches, out-of-order included") {
    val dir = "/root/testdata/sf0.001"
    val src = graft.Tables.events(spark, dir)
    val in = Files.createTempDirectory("funnel_in").toString
    // two files, interleaved by id parity → cross-batch + out-of-order
    src.filter($"event_id" % 2 === 0).coalesce(1)
      .write.mode("append").parquet(in)
    src.filter($"event_id" % 2 === 1).coalesce(1)
      .write.mode("append").parquet(in)

    val events = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .select($"user_id", Streaming.tsMicros($"ts").as("tsu"), $"event_type")
      .withColumn("event_ts", timestamp_micros($"tsu"))
      .withWatermark("event_ts", "0 seconds")
      .as[Streaming.ProfileEventW]

    val name = "funnel_multibatch_sink"
    val q = Streaming.funnelFold(events).toDF()
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 2, s"expected >=2 data micro-batches, saw $batches")

    val got = spark.table(name)
      .groupBy($"user_id")
      .agg(max(struct($"n_events", $"converted")).as("m"))
      .filter($"m.converted")
      .select($"user_id", $"m.n_events".as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    val tsu = Streaming.tsMicros($"ts")
    val expect = src.groupBy($"user_id")
      .agg(min(when($"event_type" === "view", tsu)).as("v"),
        min(when($"event_type" === "click", tsu)).as("c"),
        min(when($"event_type" === "purchase", tsu)).as("p"),
        count(lit(1)).as("n_events"))
      .filter($"v" < $"c" && $"c" < $"p")
      .select($"user_id", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    assert(got == expect,
      s"streaming funnel diverged from batch: got=$got expect=$expect")
    spark.catalog.dropTempView(name)
    org.apache.spark.sql.GraftStreamingBridge.unloadAllStateStores()
  }
}
