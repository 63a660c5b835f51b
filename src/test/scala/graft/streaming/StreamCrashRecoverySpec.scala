package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException, Trigger}
import graft.SparkSpec

/** One-shot fault injector for the crash-recovery gate. The CAS
  * guarantees exactly one injected failure per arm(): the first task
  * that sees an armed gate throws (failing the micro-batch before its
  * commit), and the restarted query sees a disarmed gate. Static state
  * is visible to tasks because local mode shares the JVM. */
object CrashGate {
  val armed = new AtomicBoolean(false)
  def maybeCrash(): Unit =
    if (armed.compareAndSet(true, false))
      throw new RuntimeException("graft injected mid-batch crash")
}

/** Crash-recovery gate (VERDICT r4 missing item 3): exactly-once under
  * failure. The reference guards re-delivered S3 files with a
  * hand-rolled idempotency check
  * (`/root/reference/src/AnalyzeEtlWaitStatusLambda/index.py:76-96`);
  * Structured Streaming's equivalent is checkpoint + sink commit log,
  * and this spec proves that contract end to end: a stateful query is
  * killed MID-BATCH (injected task failure, after the batch's tasks
  * started but before its commit), restarted from the same checkpoint,
  * and the file sink must hold exactly the batch-oracle rows — no loss
  * (state from the committed batch survived the crash), no duplicates
  * (the failed batch's partial sink output was never committed and the
  * replay wrote each row once).
  */
class StreamCrashRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("stateful session query recovers exactly-once from a mid-batch crash") {
    val src = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val withTsu = src.withColumn("tsu", Streaming.tsMicros(col("ts")))
    val bounds = withTsu.agg(min($"tsu"), max($"tsu")).head()
    val cutoff = (bounds.getLong(0) + bounds.getLong(1)) / 2

    val in = Files.createTempDirectory("crash_in").toString
    val out = Files.createTempDirectory("crash_out").toString
    val ckpt = Files.createTempDirectory("crash_ckpt").toString
    withTsu.filter($"tsu" < cutoff).drop("tsu").write.mode("append").parquet(in)

    val crashUdf = udf { (tsu: Long) =>
      if (tsu >= cutoff) CrashGate.maybeCrash(); true
    }
    def start() = {
      val events = spark.readStream.schema(src.schema).parquet(in)
        .select($"user_id", $"event_id", Streaming.tsMicros($"ts").as("tsu"))
        .filter(crashUdf($"tsu"))
        .withColumn("event_ts", timestamp_micros($"tsu"))
        .withWatermark("event_ts", "0 seconds")
        .as[Streaming.SessionEventW]
      Streaming.sessionFlows(events, gapMinutes = 30).toDF()
        .writeStream.outputMode(OutputMode.Append)
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
    }

    // Run 1: first half only — commits its batches, leaving open
    // sessions in the state store.
    start().awaitTermination()

    // Run 2: second half arrives; the gate fires on its first row, so
    // the query dies inside the new batch, after run 1's state was
    // committed but before this batch commits anything.
    withTsu.filter($"tsu" >= cutoff).drop("tsu").write.mode("append").parquet(in)
    CrashGate.armed.set(true)
    val crashed = intercept[StreamingQueryException] { start().awaitTermination() }
    assert(crashed.getMessage.contains("injected mid-batch crash") ||
      String.valueOf(crashed.getCause).contains("injected mid-batch crash"))
    assert(!CrashGate.armed.get, "the injected crash never fired")

    // Run 3: restart from the same checkpoint — replays the failed
    // batch against the recovered state and drains to completion.
    start().awaitTermination()

    // Oracle: the batch gaps-and-islands plan over ALL events with
    // st6's strict finalization cutoff (timeout < final watermark ms).
    val all = spark.read.parquet(in)
    val wmMs = all.select(max(Streaming.tsMicros($"ts"))).head().getLong(0) / 1000
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
    val expect = Streaming.sessionize(all, 30)
      .groupBy($"user_id", $"session_seq")
      .agg(min($"tsu").as("start_tsu"), max($"tsu").as("end_tsu"),
        count(lit(1)).as("n_events"))
      .withColumn("mx", max($"session_seq").over(w))
      .filter($"session_seq" < $"mx" ||
        expr("end_tsu div 1000") + lit(30 * 60 * 1000L) < lit(wmMs))
      .select($"user_id", $"start_tsu", $"end_tsu", $"n_events")

    def rows(df: DataFrame): Seq[(Long, Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    // reading through the sink's _spark_metadata commit log: files the
    // crashed batch left behind are invisible unless committed
    val got = rows(spark.read.parquet(out).select(
      $"user_id", $"start_tsu", $"end_tsu", $"n_events"))
    val oracle = rows(expect)
    assert(oracle.nonEmpty)
    assert(got.size === got.distinct.size, "duplicate rows: the replayed batch double-wrote")
    assert(got === oracle)
  }
}
