package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import graft.SparkSpec

/** Pins the property the st19 gate's single-batch drain cannot see: the
  * carried-reading ValueState SURVIVES a flush. A user whose buffer was
  * finalized in an earlier batch must carry its last reading into
  * events that arrive in later batches — if the carry lived in the
  * (cleared) pending buffer instead, the late event would read null.
  */
class LocfTwsSpec extends SparkSpec {
  import spark.implicits._

  private val schema =
    "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def run(name: String, files: Seq[Seq[String]]): Map[Long, (Option[Double], Option[Double])] = {
    val in = Files.createTempDirectory(s"locf_$name").toString
    files.zipWithIndex.foreach { case (lines, i) =>
      Files.writeString(java.nio.file.Paths.get(in, f"b$i%03d.json"), lines.mkString("\n"))
      java.nio.file.Paths.get(in, f"b$i%03d.json").toFile.setLastModified(1700000000000L + i * 1000L)
    }
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(in)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsu"),
        col("event_type"), col("value"), col("ts").as("event_ts"))
      .withWatermark("event_ts", "0 seconds")
      .as[Streaming.LocfEvt]
    val rows = events.groupByKey(_.user_id)
      .transformWithState(new Streaming.LocfProcessor,
        TimeMode.EventTime(), OutputMode.Append)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksdb)
    try {
      val q = rows.toDF()
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName(s"locf_out_$name")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
    spark.table(s"locf_out_$name").collect().map { r =>
      r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Double]("reading")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("carried")).map(_.doubleValue)))
    }.toMap
  }

  private def ev(uid: Long, eid: Long, ts: String, tpe: String, v: Double): String =
    s"""{"user_id":$uid,"event_id":$eid,"ts":"$ts","event_type":"$tpe","value":$v}"""

  test("carried reading survives a flush and reaches later-batch events") {
    val out = run("carry", Seq(
      // b0: user 1 takes a reading, then a view (same batch)
      Seq(ev(1, 1, "2024-01-01T00:00:00", "click", 5.0),
        ev(1, 2, "2024-01-01T00:10:00", "view", 9.9)),
      // b1: unrelated user advances the watermark past user 1's events,
      // firing user 1's finalize timer -> e1/e2 emit, buffer clears
      Seq(ev(2, 3, "2024-01-01T01:00:00", "view", 1.0)),
      // b2: user 1 re-appears long after the flush; only the surviving
      // ValueState can know 5.0. user 3 has no reading ever.
      Seq(ev(1, 4, "2024-01-01T02:00:00", "view", 7.7),
        ev(3, 5, "2024-01-01T02:00:00", "view", 8.8))))
    assert(out(1L) === ((Some(5.0), Some(5.0))), "click carries itself")
    assert(out(2L) === ((None, Some(5.0))), "same-batch view carries the click")
    assert(out(4L) === ((None, Some(5.0))),
      "post-flush event must carry via the surviving ValueState")
    assert(out(3L) === ((None, None)), "user 2 never saw a reading")
    assert(out(5L) === ((None, None)), "user 3 never saw a reading")
    assert(out.size === 5, "every event emitted exactly once")
  }

  test("out-of-arrival-order events still fold in event-time order") {
    // both events arrive in ONE batch but in reversed event-time order:
    // the buffer sort must put the click first
    val out = run("sort", Seq(
      Seq(ev(7, 11, "2024-01-01T00:30:00", "view", 0.0),
        ev(7, 10, "2024-01-01T00:00:00", "click", 2.5))))
    assert(out(10L) === ((Some(2.5), Some(2.5))))
    assert(out(11L) === ((None, Some(2.5))), "later view carries earlier click")
  }
}
