package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import graft.SparkSpec

/** Pins the transformWithState session operator (st8) to the legacy
  * flatMapGroupsWithState semantics it replaces: identical emissions on
  * multi-batch input, state removal + fresh epoch after a timer fires,
  * and the strict-< timer comparator (a timer exactly AT the watermark
  * does not fire) that st6's shared batch oracle encodes.
  */
class TwsSessionFlowsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = "user_id LONG, event_id LONG, ts TIMESTAMP"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Write one file per batch and run the TWS session processor with
    * AvailableNow (RocksDB store — the only provider TWS supports). */
  private def run(name: String, gapMinutes: Int,
      files: Seq[Seq[String]]): Seq[(Long, Long, Long, Long)] = {
    val in = Files.createTempDirectory(s"tws_$name").toString
    files.zipWithIndex.foreach { case (lines, i) =>
      Files.writeString(java.nio.file.Paths.get(in, f"b$i%03d.json"), lines.mkString("\n"))
      java.nio.file.Paths.get(in, f"b$i%03d.json").toFile.setLastModified(1700000000000L + i * 1000L)
    }
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(in)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsu"), col("ts").as("event_ts"))
      .withWatermark("event_ts", "0 seconds")
      .as[Streaming.SessionEventW]
    val flows = events.groupByKey(_.user_id)
      .transformWithState(new Streaming.SessionFlowProcessor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksdb)
    try {
      val q = flows.toDF()
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName(s"tws_out_$name")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
    spark.table(s"tws_out_$name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
  }

  private def ev(uid: Long, eid: Long, ts: String): String =
    s"""{"user_id":$uid,"event_id":$eid,"ts":"$ts"}"""

  private def us(ts: String): Long =
    java.time.Instant.parse(ts + "Z").toEpochMilli * 1000L

  test("timer fires emit the open session, clear state; re-entry starts fresh") {
    // the same multi-batch scenario SessionFlowsSpec pins for the legacy
    // operator — TWS must reproduce it exactly
    val out = run("removal", 30, Seq(
      Seq(ev(1, 1, "2024-01-01T00:00:00"), ev(1, 2, "2024-01-01T00:10:00")),
      Seq(ev(2, 3, "2024-01-01T02:00:00")),
      Seq(ev(3, 4, "2024-01-01T02:01:00")),
      Seq(ev(1, 5, "2024-01-01T02:02:00")),
      Seq(ev(4, 6, "2024-01-01T10:00:00"))))
    val user1 = out.filter(_._1 == 1L)
    assert(user1 === Seq(
      (1L, us("2024-01-01T00:00:00"), us("2024-01-01T00:10:00"), 2L),
      (1L, us("2024-01-01T02:02:00"), us("2024-01-01T02:02:00"), 1L)))
    assert(out.filter(_._1 == 2L).map(_._4) === Seq(1L))
    assert(out.filter(_._1 == 3L).map(_._4) === Seq(1L))
    // user 4 still open at end-of-stream: not emitted
    assert(out.filter(_._1 == 4L).isEmpty)
  }

  test("timer boundary: watermark exactly AT end+gap does not fire (strict <)") {
    // same comparator as GroupStateTimeout — the property that lets st8
    // share st6's batch oracle verbatim
    val out = run("boundary", 30, Seq(
      Seq(ev(1, 1, "2024-01-01T00:00:00")),
      Seq(ev(2, 2, "2024-01-01T00:30:00")),
      Seq(ev(3, 3, "2024-01-01T00:30:00"))))
    assert(out.filter(_._1 == 1L).isEmpty)

    val out2 = run("boundary2", 30, Seq(
      Seq(ev(1, 1, "2024-01-01T00:00:00")),
      Seq(ev(2, 2, "2024-01-01T00:30:00.001")),
      Seq(ev(3, 3, "2024-01-01T00:30:00.001"))))
    assert(out2.filter(_._1 == 1L).map(_._4) === Seq(1L))
  }

  test("st9 MapState profiles: mid-stream finalize splits epochs; SUM restores totals") {
    // user 1 has events in B1 and (after the watermark passes its B1
    // timer) again in B4 — the MapState finalizes twice, one partial
    // profile row per epoch; the downstream SUM must equal the batch
    // count. Run the raw processor (no SUM) to see the epochs.
    val in = Files.createTempDirectory("tws_profile").toString
    val files = Seq(
      Seq(ev(1, 1, "2024-01-01T00:00:00"), ev(1, 2, "2024-01-01T00:01:00")),
      // B2 processes with the watermark already at 00:01:00 (computed
      // from B1's data); user 1's timer at 00:01:00 satisfies the
      // inclusive comparator and fires HERE — epoch-1 profile emits
      Seq(ev(2, 3, "2024-01-01T05:00:00")),
      Seq(ev(3, 4, "2024-01-01T05:01:00")),
      Seq(ev(1, 5, "2024-01-01T05:02:00")), // user 1 re-opens: epoch 2
      Seq(ev(4, 6, "2024-01-01T10:00:00"))) // finalizes the stragglers
    files.zipWithIndex.foreach { case (lines, i) =>
      Files.writeString(java.nio.file.Paths.get(in, f"b$i%03d.json"), lines.mkString("\n"))
      java.nio.file.Paths.get(in, f"b$i%03d.json").toFile.setLastModified(1700000000000L + i * 1000L)
    }
    val events = spark.readStream
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").json(in)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        lit("view").as("event_type"), col("ts").as("event_ts"))
      .withWatermark("event_ts", "0 seconds")
      .as[Streaming.ProfileEventW]
    val profiles = events.groupByKey(_.user_id)
      .transformWithState(new Streaming.UserProfileProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksdb)
    try {
      val q = profiles.toDF().writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("tws_profile_out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
    val rows = spark.table("tws_profile_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // user 1: TWO epoch rows (2 events, then 1); their sum is the batch count
    val u1 = rows.filter(_._1 == 1L).map(_._3).sorted
    assert(u1 === Seq(1L, 2L))
    // user 4's events are at the final watermark (inclusive comparator):
    // finalized in the trailing batch
    assert(rows.filter(_._1 == 4L).map(_._3) === Seq(1L))
  }

  test("session_window boundary: watermark exactly AT the gap-extended end DOES emit (inclusive)") {
    // the built-in closes a session when the watermark reaches window.end
    // (= last event + gap) — INCLUSIVE, unlike the GroupState timeout's
    // strict < — which is why st10's oracle cutoff is `<=` where st6's
    // is `<`. This test is the tripwire for that comparator.
    def run(name: String, files: Seq[Seq[String]]): Seq[(Long, Long)] = {
      val in = Files.createTempDirectory(s"swin_$name").toString
      files.zipWithIndex.foreach { case (lines, i) =>
        Files.writeString(java.nio.file.Paths.get(in, f"b$i%03d.json"), lines.mkString("\n"))
        java.nio.file.Paths.get(in, f"b$i%03d.json").toFile.setLastModified(1700000000000L + i * 1000L)
      }
      val out = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").json(in)
        .withWatermark("ts", "0 seconds")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("n"))
      val q = out.writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName(s"swin_out_$name")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(s"swin_out_$name")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    // user 1's session [00:00, 00:30): watermark lands exactly at 00:30
    val atBoundary = run("at", Seq(
      Seq(ev(1, 1, "2024-01-01T00:00:00")),
      Seq(ev(2, 2, "2024-01-01T00:30:00")),
      Seq(ev(3, 3, "2024-01-01T00:30:00"))))
    assert(atBoundary.filter(_._1 == 1L).map(_._2) === Seq(1L),
      s"inclusive close expected; got $atBoundary")
    // one ms SHORT of the boundary: still open, not emitted
    val shortOf = run("short", Seq(
      Seq(ev(1, 1, "2024-01-01T00:00:00")),
      Seq(ev(2, 2, "2024-01-01T00:29:59.999")),
      Seq(ev(3, 3, "2024-01-01T00:29:59.999"))))
    assert(shortOf.filter(_._1 == 1L).isEmpty, s"premature close: $shortOf")
    // SUB-MILLISECOND: session end is 500µs past the ms watermark — the
    // eviction compares at µs precision, so the session stays open. An
    // oracle that truncated the session end to ms before comparing
    // would wrongly emit this one (the cutoff must be
    // `end_us <= wm_ms * 1000`, not `end_us // 1000 <= wm_ms`).
    val subMs = run("subms", Seq(
      Seq(ev(1, 1, "2024-01-01T00:00:00.000500")),
      Seq(ev(2, 2, "2024-01-01T00:30:00")),
      Seq(ev(3, 3, "2024-01-01T00:30:00"))))
    assert(subMs.filter(_._1 == 1L).isEmpty, s"sub-ms boundary leaked: $subMs")
  }

  test("st8 equals st6 row-for-row on the gate directory") {
    val dir = "/root/testdata/sf0.001"
    val legacy = graft.operators.StreamingQueries.st6(spark, dir)
      .collect().map(_.toString).toSeq
    val tws = graft.operators.StreamingQueries.st8(spark, dir)
      .collect().map(_.toString).toSeq
    assert(tws === legacy)
    assert(tws.nonEmpty)
    // the RocksDB provider override was restored after the TWS query
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }
}
