package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import graft.SparkSpec

/** Multi-batch proof for the st27 streaming window-funnel: the gate
  * drains its directory in one AvailableNow batch, so on its own it
  * cannot distinguish "DP state carries across batches" from "rescans
  * everything". Here a hand fixture splits each user's chain across
  * two TIME-ORDERED files processed one per micro-batch — the view
  * lands in batch 1, the click/purchase in batch 2 — so a correct
  * level-3 verdict REQUIRES the achieve-times ValueState to survive
  * the first finalize. (Time-ordered, not parity-interleaved: the
  * buffer-until-watermark fold assumes event-time progresses across
  * finalizes, the same arrival contract as st19's LOCF.)
  */
class WindowFunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  test("funnel chains straddling micro-batches still reach their level") {
    val h = 3600000000L // 1h in µs
    val t0 = 1700000000000000L
    // batch 1: views only; batch 2: user 1 completes within the window,
    // user 2's click misses it (gap 2h)
    val f1 = Seq((1L, 101L, t0, 1), (2L, 201L, t0, 1))
    val f2 = Seq((1L, 102L, t0 + h / 6, 2), (1L, 103L, t0 + h / 3, 3),
      (2L, 202L, t0 + 2 * h, 2))
    val in = Files.createTempDirectory("wf_in").toString
    f1.toDF("user_id", "event_id", "tsu", "step")
      .coalesce(1).write.mode("append").parquet(in)
    f2.toDF("user_id", "event_id", "tsu", "step")
      .coalesce(1).write.mode("append").parquet(in)

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val schema = spark.read.parquet(in).schema
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .withColumn("event_ts", timestamp_micros($"tsu"))
      .withWatermark("event_ts", "0 seconds")
      .as[Streaming.WfEvt]
    val name = "wf_multibatch_sink"
    val q = events.groupByKey(_.user_id)
      .transformWithState(new Streaming.WindowFunnelProcessor(h),
        TimeMode.EventTime(), OutputMode.Append)
      .toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 2, s"expected >=2 data micro-batches, saw $batches")

    val got = spark.table(name)
      .groupBy($"user_id")
      .agg(max(struct($"n_seen", $"lvl")).as("m"))
      .select($"user_id", $"m.lvl".as("lvl"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // user 1's chain straddles the batch boundary and completes;
    // user 2's click misses the 1h window entirely
    assert(got === Seq((1L, 3L), (2L, 1L)))
    spark.catalog.dropTempView(name)
    } finally prevProvider match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
  }
}
