package graft.operators

import org.apache.spark.sql.SparkSession

/** Public entry for redundant self-join elimination (see
  * [[graft.plans.SelfJoinElimination]] for the match conditions and
  * the soundness argument). */
object SelfJoin {

  /** Installs the elimination rule on the session: after this, an
    * inner self-join of the same (deterministic) relation on a
    * provably-unique key collapses to a single copy — one scan, one
    * aggregate, zero join exchanges. Also installed by
    * `GraftExtensions`; disable per-session with
    * `spark.graft.selfJoin.eliminate=false`. */
  def enable(spark: SparkSession): Unit =
    graft.plans.SessionRegistration.ensureRules(spark,
      Seq(graft.plans.SelfJoinElimination))
}
