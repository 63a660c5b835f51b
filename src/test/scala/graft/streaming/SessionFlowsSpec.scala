package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkSpec

/** Pins the bounded-state behavior of the stateful session operators
  * (VERDICT r2 item 3): the event-time timeout emits the open session
  * and REMOVES the key's state, so a user reappearing later starts a
  * fresh epoch instead of extending a zombie session. Multi-batch
  * micro-batch sequencing is forced with maxFilesPerTrigger=1 (one
  * file = one batch, processed in filename order for same-mtime files).
  */
class SessionFlowsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = "user_id LONG, event_id LONG, ts TIMESTAMP"

  /** Write one file per batch, run sessionFlows with AvailableNow, and
    * return the emitted (user_id, start_tsu, end_tsu, n_events) rows. */
  private def run(name: String, gapMinutes: Int, files: Seq[Seq[String]]): Seq[(Long, Long, Long, Long)] = {
    val in = Files.createTempDirectory(s"flows_$name").toString
    files.zipWithIndex.foreach { case (lines, i) =>
      Files.writeString(java.nio.file.Paths.get(in, f"b$i%03d.json"), lines.mkString("\n"))
      // one mtime step per file keeps the file-source batch order stable
      java.nio.file.Paths.get(in, f"b$i%03d.json").toFile.setLastModified(1700000000000L + i * 1000L)
    }
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(in)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsu"), col("ts").as("event_ts"))
      .withWatermark("event_ts", "0 seconds")
      .as[Streaming.SessionEventW]
    val q = Streaming.sessionFlows(events, gapMinutes).toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(s"flows_out_$name")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(s"flows_out_$name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
  }

  private def ev(uid: Long, eid: Long, ts: String): String =
    s"""{"user_id":$uid,"event_id":$eid,"ts":"$ts"}"""

  private def us(ts: String): Long =
    java.time.Instant.parse(ts + "Z").toEpochMilli * 1000L

  test("timeout emits the open session and removes state; re-entry starts fresh") {
    val out = run("removal", 30, Seq(
      // B1: user 1 opens a session (2 events, 10 min apart)
      Seq(ev(1, 1, "2024-01-01T00:00:00"), ev(1, 2, "2024-01-01T00:10:00")),
      // B2: user 2 far in the future -> watermark jumps to 02:00
      Seq(ev(2, 3, "2024-01-01T02:00:00")),
      // B3: watermark (02:00) is past user 1's timeout (00:40) -> user
      // 1's session emits and its state is removed in this batch
      Seq(ev(3, 4, "2024-01-01T02:01:00")),
      // B4: user 1 reappears -> must start a FRESH session (state was
      // removed; a zombie state would make this a continuation carrying
      // the old counters)
      Seq(ev(1, 5, "2024-01-01T02:02:00")),
      // B5: far-future event times out everything still open
      Seq(ev(4, 6, "2024-01-01T10:00:00"))))

    val user1 = out.filter(_._1 == 1L)
    assert(user1 === Seq(
      (1L, us("2024-01-01T00:00:00"), us("2024-01-01T00:10:00"), 2L),
      (1L, us("2024-01-01T02:02:00"), us("2024-01-01T02:02:00"), 1L)))
    // users 2 and 3 timed out too (open at end-of-stream would be absent)
    assert(out.filter(_._1 == 2L).map(_._4) === Seq(1L))
    assert(out.filter(_._1 == 3L).map(_._4) === Seq(1L))
    // user 4's session is still open at end-of-stream: not emitted
    assert(out.filter(_._1 == 4L).isEmpty)
  }

  test("RocksDB state store produces identical results (conf-gated scale path)") {
    val dir = "/root/testdata/sf0.001"
    val hdfs = graft.operators.StreamingQueries.st6(spark, dir).collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.streaming.stateStore", "rocksdb")
    try {
      val rocks = graft.operators.StreamingQueries.st6(spark, dir).collect().map(_.toString).toSeq
      assert(rocks === hdfs)
      assert(hdfs.nonEmpty)
      // the provider conf was restored (to its default) after the gated run
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("HDFSBackedStateStoreProvider"))
    } finally spark.conf.unset("spark.graft.streaming.stateStore")
  }

  test("timeout boundary: watermark exactly AT end+gap does not fire (strict <)") {
    // user 1 session ends 00:00; timeout timestamp = 00:30.000.
    // B2/B3 move the watermark to exactly 00:30.000: Spark's event-time
    // timeout fires only when timeoutTimestamp < watermark (strict), so
    // nothing emits. st6's oracle encodes the same strict comparator
    // (`end_tsu // 1000 + gap_ms < wm_ms` in StreamingQueries.st6Sql) —
    // this test is the tripwire if that ever changes.
    val out = run("boundary", 30, Seq(
      Seq(ev(1, 1, "2024-01-01T00:00:00")),
      Seq(ev(2, 2, "2024-01-01T00:30:00")),
      Seq(ev(3, 3, "2024-01-01T00:30:00"))))
    assert(out.filter(_._1 == 1L).isEmpty)

    // one millisecond past the boundary -> fires
    val out2 = run("boundary2", 30, Seq(
      Seq(ev(1, 1, "2024-01-01T00:00:00")),
      Seq(ev(2, 2, "2024-01-01T00:30:00.001")),
      Seq(ev(3, 3, "2024-01-01T00:30:00.001"))))
    assert(out2.filter(_._1 == 1L).map(_._4) === Seq(1L))
  }
}
