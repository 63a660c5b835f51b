package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.storage.StorageLevel

/** Materialization discipline for fan-out subtrees and iterative state.
  *
  * Why pins exist (r9 finding, guide §2.4): a `BroadcastExchange` build
  * reuses no shuffle stage, so a DataFrame consumed by 2+ downstream
  * joins where one side broadcasts re-executes its ENTIRE upstream once
  * per consumer (ReuseExchange only dedups shuffle exchanges). Pinning
  * the fan-out point materializes it once.
  *
  * Why this is a helper and not bare `localCheckpoint` at every site
  * (r9 verdict item 3): `localCheckpoint` truncates lineage and stores
  * blocks unreplicated on executors — on a cluster, one lost executor
  * fails the job. The pin MODE is therefore a conf, with the local-mode
  * default preserving the bench plans byte-for-byte:
  *
  *   spark.graft.pin.mode = local | persist | reliable
  *
  *  - `local` (default): `localCheckpoint(eager)` — zero-copy executor
  *    block cache, lineage truncated. Right for local[n] and for
  *    clusters that accept recompute-from-scratch on executor loss.
  *  - `persist`: `persist(MEMORY_AND_DISK)` — KEEPS lineage, so an
  *    executor loss recomputes the lost partitions instead of failing
  *    the job, and the CacheManager retains the frame's size statistics
  *    (AQE can still pick broadcast strategies from real sizes). The
  *    cluster-scale default for [[pinForFanout]].
  *  - `reliable`: `checkpoint(eager)` — writes to the SparkContext
  *    checkpoint directory (caller must `setCheckpointDir` to durable
  *    storage); survives executor loss, truncates lineage. Right for
  *    the heavy pins on very long jobs.
  */
object Pins {

  private def mode(df: DataFrame): String =
    df.sparkSession.conf.get("spark.graft.pin.mode", "local")

  /** Pin a frame consumed by multiple downstream operators (a fan-out
    * point). `eager = true` materializes now — callers that need
    * materialize-before-use semantics (stream-static sides, frames
    * whose count feeds a driver scalar) say so explicitly. */
  def pinForFanout(df: DataFrame, eager: Boolean = false): DataFrame =
    mode(df) match {
      case "persist" =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        if (eager) { p.count(); () }
        p
      case "reliable" => df.checkpoint(eager)
      case _ => df.localCheckpoint(eager)
    }

  /** Pin one round of iterative state (CC rounds, label-prop rounds,
    * pointer-doubling). Unlike a fan-out pin this MUST truncate lineage
    * — the loop otherwise grows the plan (and task closures) linearly
    * in rounds — so `persist` mode falls back to `local` here and only
    * `reliable` changes the storage. */
  def pinIterative(df: DataFrame, eager: Boolean = false): DataFrame =
    mode(df) match {
      case "reliable" => df.checkpoint(eager)
      case _ => df.localCheckpoint(eager)
    }

  /** Broadcast hint gated on a row-count ceiling (r9 verdict item 1).
    *
    * An explicit `broadcast()` hint is honored regardless of size, so
    * hinting a DATA-cardinality frame (token occurrences, vocabularies,
    * prefix expansions) plans a broadcast that OOMs at 100 TB. The
    * hints exist because a checkpointed frame loses its size estimate
    * and a join AQE would have broadcast re-plans as sort-merge; this
    * gate keeps the hint exactly while the frame is provably small:
    * count it (the callers pass pinned frames that are about to be
    * materialized for their consumers anyway, so the count is one
    * cheap pass that warms the pin) and hint only under
    *
    *   spark.graft.broadcastPin.maxRows   (default 4,000,000)
    *
    * Over the ceiling the planner keeps its own choice — a shuffle
    * join at scale, never a forced broadcast. Results are identical on
    * both paths (the hint changes strategy, not semantics); set the
    * conf to 0 to force the shuffle path end-to-end (PinGateSpec
    * does exactly that). */
  def broadcastIfSmall(df: DataFrame): DataFrame =
    broadcastIfSmall(df, df.count())

  /** [[broadcastIfSmall]] with a caller-supplied row count (or an upper
    * bound on it — the gate stays conservative under any overestimate).
    * Counting the build side itself can be the expensive pass (d26's
    * b-side is a prefix EXPLODE — counting it materializes the
    * expansion); callers that can read the cardinality off an already
    * pinned parent with one cached-scan aggregate pass it here instead
    * of paying a dedicated job per hint. */
  def broadcastIfSmall(df: DataFrame, rows: Long): DataFrame = {
    val maxRows = df.sparkSession.conf
      .get("spark.graft.broadcastPin.maxRows", "4000000").toLong
    if (rows <= maxRows) broadcast(df) else df
  }
}
