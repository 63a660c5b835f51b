package graft.control

import org.scalatest.funsuite.AnyFunSuite
import graft.validate.ValidationReport

/** Branch coverage for the O5 notifier (VERDICT r2 item 7): every job
  * event maps to the reference's finalize/gauge/alert set, fed by the
  * real RunReport payload and a Completion cluster reduce.
  */
class NotifierSpec extends AnyFunSuite {
  import Notifier._

  private val ctx = RunContext(
    env = "test", fileName = "prices_20240601.csv.gz", filePrefix = "prices",
    etlTimestamp = "1717200000", date = "2024-06-01")

  /** Run-report fields as the pipeline actually produces them. */
  private def reportFields(received: Long, valid: Long, failed: Seq[Option[String]]) = {
    val entry = RunReport.transformEntry("run1",
      ValidationReport(received, valid, failed, Map("f1" -> (received - valid))))
    entry.fields
  }

  test("PZ success with clean data: gauges + finalize, no alert") {
    val actions = decide(PzSuccess, ctx, reportFields(100, 100, Seq.empty))
    val gauges = actions.collect { case g: Gauge => g.name -> g.value }.toMap
    assert(gauges === Map(
      "graft_etl.pz_valid_record_count" -> 100.0,
      "graft_etl.pz_invalid_record_count" -> 0.0,
      "graft_etl.pz_total_record_count" -> 100.0))
    assert(actions.collect { case a: Alert => a }.isEmpty)
    val f = actions.collect { case f: Finalize => f }
    assert(f === Seq(Finalize(Completion.Succeeded, Seq.empty, 100, 0)))
    assert(actions.collect { case p: Post => p }.size === 1)
  }

  test("PZ success with validation losses: FAILED-OPCOS alert + failed opcos finalized") {
    val actions = decide(PzSuccess, ctx, reportFields(100, 80, Seq(Some("010"), None)))
    assert(actions.collect { case a: Alert => a.title } === Seq("FAILED OPCOS"))
    val f = actions.collect { case f: Finalize => f }.head
    assert(f.status === Completion.Succeeded)
    assert(f.failedOpcos === Seq("010", "NULL"))
    assert(f.invalidRecords === 20)
  }

  test("PA success emits opco-count gauges from the Completion reduce") {
    // two clusters' outcomes reduced the way the control plane does it
    val cluster = Completion.reduceCluster(
      Seq("010", "020", "030"), succeeded = Set("010", "020"))
    val counts = Some((3, cluster.successCount, cluster.failureCount))
    val fields = Map(
      "received_records_count" -> "500",
      "invalid_price_record_count" -> "7",
      "failed_opcos" -> cluster.failedOpcos.mkString(","))
    val actions = decide(PaSuccess, ctx, fields, counts)
    val gauges = actions.collect { case g: Gauge => g.name -> g.value }.toMap
    assert(gauges("graft_etl.pa_total_opco_count") === 3.0)
    assert(gauges("graft_etl.pa_successful_opco_count") === 2.0)
    assert(gauges("graft_etl.pa_failed_opco_count") === 1.0)
    assert(gauges("graft_etl.pa_invalid_records") === 7.0)
    // soft-validation loss -> alert even on success
    assert(actions.collect { case a: Alert => a.title } === Seq("FAILED OPCOS"))
    assert(actions.collect { case f: Finalize => f.failedOpcos }.head === Seq("030"))
  }

  test("map-state and outside failures finalize FAILED with an error gauge and alert") {
    for ((event, gaugeName, title) <- Seq(
        (PzMapFailure, "graft_etl.price_zone_error", "PRICE ZONE - MAP STATE FAILED"),
        (PzOutsideFailure, "graft_etl.price_zone_error", "ETL-PRICE_ZONE-OUTSIDE-FAILURE"),
        (PaFailure, "graft_etl.pa_error", "ETL-PA"))) {
      val actions = decide(event, ctx, Map.empty, message = "boom")
      assert(actions.collect { case f: Finalize => f.status } === Seq(Completion.Failed))
      assert(actions.collect { case g: Gauge => g.name -> g.value } === Seq(gaugeName -> 1.0))
      assert(actions.collect { case a: Alert => (a.title, a.message) } === Seq((title, "boom")))
      assert(actions.collect { case p: Post => p }.size === 1)
    }
  }

  test("gauge tags carry the run context dimensions") {
    val actions = decide(PzSuccess, ctx, reportFields(10, 10, Seq.empty))
    val t = actions.collect { case g: Gauge => g.tags }.head
    assert(t.contains("env:test") && t.contains("file:pz") &&
      t.contains("file_name:prices_20240601.csv.gz") && t.contains("date:2024-06-01"))
  }

  test("run() dispatches every action kind to its sink") {
    val sink = new CollectingSink
    val actions = decide(PzSuccess, ctx, reportFields(100, 80, Seq(Some("010"))))
    Notifier.run(actions, sink, sink, sink, ctx)
    assert(sink.gauges.size === 3)
    assert(sink.alerts.map(_._1).toSeq === Seq("FAILED OPCOS", "NOTIFY"))
    assert(sink.finalized.toSeq === Seq(
      ("prices_20240601.csv.gz@1717200000", Completion.Succeeded, Seq("010"), 100L, 20L)))
    // the log sink at least doesn't throw
    val log = new LogSink
    Notifier.run(actions.take(2), log, log, log, ctx)
  }
}
