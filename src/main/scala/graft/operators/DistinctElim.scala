package graft.operators

import org.apache.spark.sql.SparkSession

/** Public entry for redundant-DISTINCT elimination (see
  * [[graft.plans.DistinctElimination]] for the match conditions, the
  * soundness argument, and the vanilla-Spark non-redundancy probes). */
object DistinctElim {

  /** Installs the elimination rule on the session: after this, a
    * `SELECT DISTINCT` whose output provably contains a per-row-unique
    * key (aggregate/dedup keys through this engine's native as-of
    * join, `monotonically_increasing_id`, `Range` ids) collapses to a
    * Project — removing a full exchange plus hash-dedup of the whole
    * relation. Also installed by `GraftExtensions`; disable
    * per-session with `spark.graft.distinct.eliminate=false`. */
  def enable(spark: SparkSession): Unit =
    graft.plans.SessionRegistration.ensureRules(spark,
      Seq(graft.plans.DistinctElimination))
}
