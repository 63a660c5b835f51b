package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stateful streaming sessionization equals the batch window plan") {
    val events = graft.Tables.events(spark, dir)
    val batch = Streaming.sessionize(events, 30)
      .groupBy($"user_id")
      .agg(max($"session_seq").as("n_sessions"), count(lit(1)).as("n_events"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val typed = events.select(
      $"user_id", $"event_id", Streaming.tsMicros($"ts").as("tsu"))
      .withColumn("event_ts", timestamp_micros($"tsu"))
      .as[Streaming.SessionEventW]
    val streaming = Streaming.sessionizeStreaming(typed, 30)
      .collect().map(u => u.user_id -> ((u.n_sessions, u.n_events))).toMap

    assert(streaming === batch)
  }

  test("hourly streaming agg is non-empty and keyed correctly") {
    val out = Streaming.hourlyEventCounts(spark, dir)
    assert(out.count() > 0)
    assert(out.columns.toSeq === Seq("hour", "event_type", "n", "sum_value_scaled"))
    // total events preserved across windows
    val total = out.agg(sum($"n")).head().getLong(0)
    assert(total === graft.Tables.events(spark, dir).count())
  }

  test("chained dedup->agg equals batch count-distinct up to the append cutoff") {
    val out = Streaming.distinctUsersHourly(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val events = graft.Tables.events(spark, dir)
      .select(Streaming.tsMicros($"ts").as("tsu"), $"event_type", $"user_id")
    val maxTsu = events.agg(max($"tsu")).head().getLong(0)
    val wm = maxTsu - 3600000000L
    // batch truth, restricted to windows finalized at the last watermark
    val batch = events
      .withColumn("hidx", expr("tsu div 3600000000"))
      .filter(($"hidx" + 1) * 3600000000L <= wm)
      .groupBy($"hidx", $"event_type")
      .agg(countDistinct($"user_id").as("n_users"))
      .select(date_format(timestamp_micros($"hidx" * 3600000000L), "yyyy-MM-dd HH:mm").as("hour"),
        $"event_type", $"n_users")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === batch)
    // the cutoff really withheld the trailing (non-final) window(s)
    val allWindows = events.select(expr("tsu div 3600000000")).distinct().count()
    assert(out.keySet.map(_._1).size < allWindows,
      "windows inside the watermark horizon must not emit")
  }
}
