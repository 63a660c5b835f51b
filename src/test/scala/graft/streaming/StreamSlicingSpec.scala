package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Micro-batch SLICING INVARIANCE — the property behind the chunked
  * replays (st30/st31 and the STATE_SF01 audit): slicing one bounded
  * input into N event-time-contiguous micro-batches must not change a
  * gate's result, because (a) contiguous ranges produce no cross-batch
  * late data, and (b) mid-stream watermark eviction only finalizes
  * windows/join-buffers no future row can touch. Any divergence here is
  * a real incremental-execution bug (state lost or double-emitted), not
  * watermark modeling.
  */
class StreamSlicingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("chunked events dir: N ts-range files, other tables linked, rows preserved") {
    val staged = Streaming.chunkedEventsDir(spark, sf, 4)
    val parts = new java.io.File(s"$staged/events.parquet")
      .listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length == 4)
    // strictly ascending mtimes = deterministic file-source admission order
    assert(parts.map(_.lastModified()).sliding(2).forall(p => p(0) < p(1)))
    val orig = spark.read.parquet(s"$sf/events.parquet")
    val chunked = spark.read.parquet(s"$staged/events.parquet")
    assert(chunked.count() == orig.count())
    // symlinked companion tables resolve
    assert(spark.read.parquet(s"$staged/customer.parquet").count() ==
      spark.read.parquet(s"$sf/customer.parquet").count())
    // staging is cached per (dir, chunks)
    assert(Streaming.chunkedEventsDir(spark, sf, 4) == staged)
  }

  test("append windowed agg is slicing-invariant (4 chunks == 1 chunk)") {
    val multi = canon(Streaming.hourlyClosedWindows(spark, sf, chunks = 4))
    val single = canon(Streaming.hourlyClosedWindows(spark, sf, chunks = 1))
    assert(multi.nonEmpty)
    assert(multi == single)
  }

  test("replay admission width is slicing-invariant (2 files/batch == 1)") {
    // the r10 bench default (replayFilesPerTrigger=2) must see the same
    // result as the strictest slicing — pairs of contiguous ts-range
    // chunks are themselves contiguous ranges, so no late data appears
    val two = canon(Streaming.hourlyClosedWindows(spark, sf, chunks = 4))
    spark.conf.set("spark.graft.streaming.replayFilesPerTrigger", "1")
    val one = try canon(Streaming.hourlyClosedWindows(spark, sf, chunks = 4))
      finally spark.conf.unset("spark.graft.streaming.replayFilesPerTrigger")
    assert(two.nonEmpty)
    assert(two == one)
  }

  test("online CUSUM fold is slicing-invariant (4 chunks == 1 chunk)") {
    // the max-n_events recovery rule must absorb mid-replay Update
    // emissions: every micro-batch re-emits cumulative counters, the
    // gate keeps only each user's last epoch
    val multi = canon(Streaming.withChunkedReplay(spark, sf, 4) { staged =>
      graft.operators.StreamingQueries.st34(spark, staged)
    })
    val single = canon(graft.operators.StreamingQueries.st34(spark, sf))
    assert(multi.nonEmpty)
    assert(multi == single)
  }

  test("lifetime session counters survive a mid-stream idle timeout " +
      "(4 chunks == 1 chunk)") {
    // regression pin for the r8 audit finding: sessionizeStreaming's
    // timeout branch used to REMOVE the per-user state, so an idle
    // period longer than the gap silently reset the lifetime counters
    // and max()-per-user picked the largest EPOCH, not the total
    val multi = canon(Streaming.withChunkedReplay(spark, sf, 4) { staged =>
      graft.operators.StreamingQueries.st5(spark, staged)
    })
    val single = canon(graft.operators.StreamingQueries.st5(spark, sf))
    assert(multi.nonEmpty)
    assert(multi == single)
  }

  test("TWS last-N snapshots reduce to the final row under any slicing " +
      "(4 chunks == 1 chunk)") {
    // regression pin for the sibling r8 finding: RecentEventsProcessor
    // cleared ring + lifetime total on its timer; mid-stream idle
    // periods then both undercounted and duplicated users. State is
    // now kept, snapshots are monotone in n_events, and the gate keeps
    // the max-n_events row per user.
    val multi = canon(Streaming.withChunkedReplay(spark, sf, 4) { staged =>
      graft.operators.StreamingQueries.st14(spark, staged)
    })
    val single = canon(graft.operators.StreamingQueries.st14(spark, sf))
    assert(multi.nonEmpty)
    assert(multi == single)
  }

  test("stream-stream interval join is slicing-invariant and audit-visible") {
    val recs = scala.collection.mutable.ArrayBuffer.empty[StreamAudit.QueryRecord]
    StreamAudit.enable(r => recs.synchronized { recs += r; () })
    try {
      // pin 1 file/micro-batch so the ≥4-batch assertion below stays
      // strong (the bench default is replayFilesPerTrigger=2)
      spark.conf.set("spark.graft.streaming.replayFilesPerTrigger", "1")
      val multi = try canon(Streaming.withChunkedReplay(spark, sf, 4) { staged =>
        Streaming.viewPurchaseJoin(spark, staged)
      }) finally spark.conf.unset("spark.graft.streaming.replayFilesPerTrigger")
      val single = canon(Streaming.viewPurchaseJoin(spark, sf))
      assert(multi.nonEmpty)
      assert(multi == single)
    } finally StreamAudit.disable()
    // the audit tap saw both drains: a multi-batch replay with live
    // state counters, and the single-batch run
    assert(recs.size == 2)
    val replay = recs.head
    assert(replay.progress.size >= 4, s"expected >=4 micro-batches, got ${replay.progress.size}")
    val stateOps = replay.progress.flatMap(_.stateOperators)
    assert(stateOps.nonEmpty)
    assert(stateOps.exists(_.numRowsRemoved > 0),
      "expected watermark eviction to fire during the chunked replay")
    assert(replay.plan.contains("StreamingSymmetricHashJoin") ||
      replay.plan.contains("symmetricHashJoin") || replay.plan.nonEmpty)
  }

  test("streaming near-dup admission is chunking-invariant (4 == 1)") {
    // any doc_id-range chunking yields the same flags: the band-min
    // election only depends on ids being non-decreasing across batches
    val multi = canon(Streaming.streamingNearDup(spark, sf, chunks = 4))
    val single = canon(Streaming.streamingNearDup(spark, sf, chunks = 1))
    assert(multi.nonEmpty)
    assert(multi == single)
  }

  test("replay conf is restored even when the body throws") {
    val key = "spark.graft.streaming.maxFilesPerTrigger"
    assert(spark.conf.getOption(key).isEmpty)
    intercept[RuntimeException] {
      Streaming.withChunkedReplay(spark, sf, 2)(_ => throw new RuntimeException("boom"))
    }
    assert(spark.conf.getOption(key).isEmpty)
  }
}
