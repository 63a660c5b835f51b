package graft.control

/** O5 — run finalization + metrics/alert emission (SURVEY.md §2.10).
  * The reference's notifier lambda
  * (`/root/reference/src/Notifier/index.py:114-283`) reduces a job
  * event to three effect kinds: finalize the run's row in the status
  * store, emit gauges to the metrics backend, and raise an alert on
  * failure or soft-validation loss; every branch also posts the
  * notification payload. Here the DECISION is a pure function from the
  * event + run-report fields to a list of [[Action]]s (trivially
  * branch-coverable), and the EFFECTS are trait-bound sinks a
  * deployment wires to its own backends ([[LogSink]] for a
  * log-and-forget default, [[CollectingSink]] for tests).
  */
object Notifier {

  /** The job events the reference distinguishes (`index.py:214-283`). */
  sealed trait JobEvent
  /** Price-zone load finished its map state successfully. */
  case object PzSuccess extends JobEvent
  /** PA load finished successfully. */
  case object PaSuccess extends JobEvent
  /** Price-zone map state failed. */
  case object PzMapFailure extends JobEvent
  /** Failure before the map state — no run report may exist. */
  case object PzOutsideFailure extends JobEvent
  /** PA job failure. */
  case object PaFailure extends JobEvent

  final case class RunContext(
      env: String,
      fileName: String,
      filePrefix: String,
      etlTimestamp: String,
      /** yyyy-MM-dd, injected for determinism. */
      date: String)

  sealed trait Action
  final case class Gauge(name: String, value: Double, tags: Seq[String]) extends Action
  final case class Alert(title: String, message: String) extends Action
  final case class Finalize(status: Completion.Status, failedOpcos: Seq[String],
      totalRecords: Long, invalidRecords: Long) extends Action
  /** The always-posted notification payload (`index.py:280-283`). */
  final case class Post(fields: Map[String, String]) extends Action

  trait MetricsSink { def gauge(name: String, value: Double, tags: Seq[String]): Unit }
  trait AlertSink { def alert(title: String, message: String): Unit }
  trait StatusStore {
    def finalizeRun(ctx: RunContext, status: Completion.Status,
        failedOpcos: Seq[String], totalRecords: Long, invalidRecords: Long): Unit
  }

  private def tags(ctx: RunContext, file: String): Seq[String] = Seq(
    "service:graft-etl", s"file:$file", s"env:${ctx.env}",
    s"timestamp:${ctx.etlTimestamp}", s"file_name:${ctx.fileName}",
    s"file_prefix:${ctx.filePrefix}", s"date:${ctx.date}")

  private def payload(ctx: RunContext, event: String, status: String, message: String) = Post(Map(
    "application" -> "GRAFT_PRICING",
    "event" -> event, "status" -> status, "message" -> message,
    "environment" -> ctx.env, "file_name" -> ctx.fileName,
    "etl_timestamp" -> ctx.etlTimestamp))

  /** Pure decision: event + run-report fields → effects, mirroring the
    * reference's branches:
    *
    *  - PZ success (`index.py:214-233`): record-count gauges, status
    *    row finalized with failed opcos + invalid count, and a
    *    FAILED-OPCOS alert iff any record was lost to validation;
    *  - PA success (`index.py:250-270`): SUCCEEDED finalize, record +
    *    opco-count gauges, soft-validation alert iff invalid > 0;
    *  - map-state / outside failures (`index.py:235-248,272-279`):
    *    FAILED finalize, error gauge = 1, alert titled by the event.
    *
    * `report` carries the run-report fields (RunReport.transformEntry
    * names); `opcoCounts` is (total, succeeded, failed) from the
    * status store for PA success — the reference reads it back from
    * the executions table (`index.py:258-263`). */
  def decide(
      event: JobEvent,
      ctx: RunContext,
      report: Map[String, String],
      opcoCounts: Option[(Int, Int, Int)] = None,
      message: String = "NA"): Seq[Action] = {
    def n(key: String): Long = report.get(key).map(_.toLong).getOrElse(0L)
    val failedOpcos = report.get("failed_opcos").filter(_.nonEmpty)
      .map(_.split(',').toSeq).getOrElse(Seq.empty)
    event match {
      case PzSuccess =>
        val total = n("received_records_count")
        val valid = n("received_valid_records_count")
        val invalid = total - valid
        val t = tags(ctx, "pz")
        Seq(
          Finalize(Completion.Succeeded, failedOpcos, total, invalid),
          Gauge("graft_etl.pz_valid_record_count", valid.toDouble, t),
          Gauge("graft_etl.pz_invalid_record_count", invalid.toDouble, t),
          Gauge("graft_etl.pz_total_record_count", total.toDouble, t)) ++
          (if (invalid > 0) Seq(Alert("FAILED OPCOS", message)) else Seq.empty) :+
          payload(ctx, "PZ", "SUCCEEDED", message)
      case PaSuccess =>
        val total = n("received_records_count")
        val invalid = n("invalid_price_record_count")
        val t = tags(ctx, "pa")
        val opco = opcoCounts.map { case (tot, ok, bad) => Seq(
          Gauge("graft_etl.pa_total_opco_count", tot.toDouble, t),
          Gauge("graft_etl.pa_successful_opco_count", ok.toDouble, t),
          Gauge("graft_etl.pa_failed_opco_count", bad.toDouble, t))
        }.getOrElse(Seq.empty)
        Seq(
          Finalize(Completion.Succeeded, failedOpcos, total, invalid),
          Gauge("graft_etl.pa_total_record_count", total.toDouble, t),
          Gauge("graft_etl.pa_invalid_records", invalid.toDouble, t)) ++ opco ++
          (if (invalid > 0) Seq(Alert("FAILED OPCOS", message)) else Seq.empty) :+
          payload(ctx, "PA", "SUCCEEDED", message)
      case PzMapFailure | PzOutsideFailure =>
        Seq(
          Finalize(Completion.Failed, failedOpcos, 0L, 0L),
          Gauge("graft_etl.price_zone_error", 1.0, tags(ctx, "pz")),
          Alert(if (event == PzMapFailure) "PRICE ZONE - MAP STATE FAILED"
            else "ETL-PRICE_ZONE-OUTSIDE-FAILURE", message),
          payload(ctx, "PZ", "ERROR", message))
      case PaFailure =>
        Seq(
          Finalize(Completion.Failed, failedOpcos, 0L, 0L),
          Gauge("graft_etl.pa_error", 1.0, tags(ctx, "pa")),
          Alert("ETL-PA", message),
          payload(ctx, "PA", "ERROR", message))
    }
  }

  /** Execute decided actions against the sinks. Post actions go to the
    * alert sink's transport in the reference; here they land on the
    * metrics sink as a zero-gauge-free log line via AlertSink — kept
    * separate so a deployment can wire a real notification endpoint. */
  def run(actions: Seq[Action], metrics: MetricsSink, alerts: AlertSink,
      status: StatusStore, ctx: RunContext): Unit =
    actions.foreach {
      case Gauge(name, v, t) => metrics.gauge(name, v, t)
      case Alert(title, msg) => alerts.alert(title, msg)
      case Finalize(s, opcos, total, invalid) =>
        status.finalizeRun(ctx, s, opcos, total, invalid)
      case Post(fields) => alerts.alert("NOTIFY",
        fields.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" "))
    }

  /** Log-and-forget default sinks. */
  final class LogSink extends MetricsSink with AlertSink with StatusStore {
    private val log = org.slf4j.LoggerFactory.getLogger("graft.notifier")
    override def gauge(name: String, value: Double, tags: Seq[String]): Unit =
      log.info(s"metric $name=$value tags=${tags.mkString(",")}")
    override def alert(title: String, message: String): Unit =
      log.warn(s"alert [$title] $message")
    override def finalizeRun(ctx: RunContext, status: Completion.Status,
        failedOpcos: Seq[String], totalRecords: Long, invalidRecords: Long): Unit =
      log.info(s"finalize ${ctx.fileName}@${ctx.etlTimestamp} -> $status " +
        s"failed_opcos=${failedOpcos.mkString(",")} total=$totalRecords invalid=$invalidRecords")
  }

  /** In-memory sinks for specs. */
  final class CollectingSink extends MetricsSink with AlertSink with StatusStore {
    val gauges = scala.collection.mutable.ArrayBuffer[(String, Double, Seq[String])]()
    val alerts = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val finalized = scala.collection.mutable.ArrayBuffer[(String, Completion.Status, Seq[String], Long, Long)]()
    override def gauge(name: String, value: Double, tags: Seq[String]): Unit =
      gauges += ((name, value, tags))
    override def alert(title: String, message: String): Unit =
      alerts += ((title, message))
    override def finalizeRun(ctx: RunContext, status: Completion.Status,
        failedOpcos: Seq[String], totalRecords: Long, invalidRecords: Long): Unit =
      finalized += ((s"${ctx.fileName}@${ctx.etlTimestamp}", status, failedOpcos, totalRecords, invalidRecords))
  }
}
