package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryProgress}

/** Observability tap for the streaming gates: when enabled (by
  * [[graft.tools.DumpStreamState]] or a spec), every drain site
  * ([[Streaming.drainToLocal]], [[Streaming.drainToFile]],
  * [[LakeMerge]], [[PipelineStream]]) reports the just-terminated
  * query's name, its per-micro-batch progress — including
  * `StateOperatorProgress` (state rows total / updated / removed,
  * memory bytes, per operator) — and the last executed physical plan.
  *
  * This is the streaming twin of `DumpExecutedPlans`' batch audit: the
  * batch side proves its scale story with post-AQE executed plans
  * (PLANS_SF01.md); the streaming side's story is BOUNDED STATE, and
  * the only primary evidence for that is the engine's own
  * StateOperatorProgress counters per micro-batch, captured here
  * synchronously from `q.recentProgress` right after
  * `awaitTermination()` (no listener-bus asynchrony to race against).
  *
  * Disabled (one volatile null check per drained query) outside audit
  * runs — gates and bench pay nothing.
  */
object StreamAudit {

  /** One terminated query: memory-sink/file-sink name, every retained
    * micro-batch progress (retention = spark.sql.streaming
    * .numRecentProgressUpdates, default 100 — far above any gate's
    * batch count), and the final executed plan. */
  final case class QueryRecord(
      name: String,
      progress: Seq[StreamingQueryProgress],
      plan: String)

  @volatile private var sink: Option[QueryRecord => Unit] = None

  def enable(f: QueryRecord => Unit): Unit = { sink = Some(f) }
  def disable(): Unit = { sink = None }

  /** Called by every drain site after `awaitTermination()`. No-op
    * unless enabled. `q.explain()` prints the LAST executed batch's
    * physical plan to Console.out — captured to a string here because
    * StreamingQuery exposes no explainString API. */
  def record(q: StreamingQuery): Unit = sink.foreach { f =>
    val plan =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
          q.explain()
        }
        bos.toString("UTF-8")
      } catch {
        case scala.util.control.NonFatal(e) =>
          s"(no executed plan available: ${e.getMessage})"
      }
    val name = Option(q.name).getOrElse(q.id.toString)
    f(QueryRecord(name, q.recentProgress.toSeq, plan))
  }
}
