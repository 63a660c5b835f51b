package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkStrategy

/** Idempotent, thread-safe self-registration of graft planner
  * strategies / optimizer rules on a session's `experimental` hooks.
  * `spark.experimental.extraStrategies` is session-global mutable
  * state, so the check-then-set the query builders do on every call
  * must not race: two threads issuing their first `AsOf.join` /
  * `Interval.join` concurrently could otherwise both read the
  * pre-registration list and install duplicate entries (harmless to
  * results but a surprising session-wide side effect). One global lock
  * — registration happens at most a handful of times per JVM, so
  * contention is irrelevant. [[graft.GraftExtensions]] remains the
  * config-driven alternative; this path exists so the operators work
  * on ANY session with no `spark.sql.extensions` requirement.
  */
object SessionRegistration {
  def ensure(spark: SparkSession, strategy: SparkStrategy,
      rules: Seq[Rule[LogicalPlan]]): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(strategy))
      spark.experimental.extraStrategies =
        strategy +: spark.experimental.extraStrategies
    ensureRules(spark, rules)
  }

  /** Rules-only registration for pure optimizer features (no custom
    * planner strategy to install — e.g. [[SelfJoinElimination]]). */
  def ensureRules(spark: SparkSession,
      rules: Seq[Rule[LogicalPlan]]): Unit = synchronized {
    val missing =
      rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        missing ++ spark.experimental.extraOptimizations
  }
}
