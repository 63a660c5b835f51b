package graft.control

/** Arrival-side file classification (SURVEY.md §2.9): partial-vs-full
  * load by filename prefix rules with a size-threshold fallback —
  * `/root/reference/src/price_zone/s3_trigger_lambda.py:32-42` (prefix
  * truth table) and `:66-90` (bytes→GB heuristic, prefix rules take
  * precedence).
  */
object FileClassifier {

  final case class Classification(
      partialLoad: Boolean, matchedPrefix: Option[String], sizeGb: Double)

  /** The reference's bytes→GB constant (`s3_trigger_lambda.py:70`). */
  val BytesToGb: Double = 9.31 / 1e10

  /** Prefix truth table: first matching partial prefix wins, then full
    * prefixes, else undecided (`s3_trigger_lambda.py:32-42`; case-folded
    * name, prefixes as given). */
  def byPrefix(
      fileName: String,
      partialPrefixes: Seq[String],
      fullPrefixes: Seq[String]): (Boolean, Boolean, Option[String]) = {
    val lower = fileName.toLowerCase
    partialPrefixes.find(p => p.nonEmpty && lower.startsWith(p)) match {
      case Some(p) => (true, false, Some(p))
      case None =>
        fullPrefixes.find(p => p.nonEmpty && lower.startsWith(p)) match {
          case Some(p) => (false, true, Some(p))
          case None => (false, false, None)
        }
    }
  }

  /** Full decision (`s3_trigger_lambda.py:83-90`): prefix rules first;
    * otherwise size above the partial-load upper bound ⇒ full load. */
  def classify(
      fileName: String,
      sizeBytes: Long,
      partialPrefixes: Seq[String],
      fullPrefixes: Seq[String],
      partialSizeUpperBoundGb: Double): Classification = {
    val gb = sizeBytes * BytesToGb
    val (partial, full, prefix) = byPrefix(fileName, partialPrefixes, fullPrefixes)
    val decision =
      if (partial) true
      else if (full) false
      else if (partialSizeUpperBoundGb < gb) false
      else true
    Classification(decision, prefix, gb)
  }
}

/** O3 — completion aggregation (SURVEY.md §2.10): per-cluster load-job
  * status reduce + the "only one cluster does the backup" decision +
  * the RUNNING/SUCCEEDED/FAILED state machine —
  * `/root/reference/src/TakeBackupDecisionLambda/index.py:69-153`.
  */
object Completion {

  final case class ClusterResult(
      successCount: Int, failureCount: Int,
      successfulOpcos: Seq[String], failedOpcos: Seq[String])

  sealed trait Status
  case object Running extends Status
  case object Succeeded extends Status
  case object Failed extends Status

  final case class Decision(status: Status, shouldBackup: Boolean)

  /** Reduce one cluster's per-opco outcomes (A6: count-by-status;
    * failed = cluster − successful, `index.py:69-80,110`). */
  def reduceCluster(clusterOpcos: Seq[String], succeeded: Set[String]): ClusterResult = {
    val ok = clusterOpcos.filter(succeeded.contains)
    ClusterResult(ok.size, clusterOpcos.size - ok.size, ok,
      clusterOpcos.filterNot(succeeded.contains))
  }

  /** The cross-cluster state machine (`index.py:133-153`): given the
    * other cluster's already-recorded counts and this cluster's fresh
    * result, produce the run status and whether THIS invocation backs
    * up (exactly one cluster may — `index.py:131-134`). */
  def decide(
      totalOpcoCount: Int,
      priorSuccessCount: Int,
      priorFailedCount: Int,
      cluster: ClusterResult): Decision = {
    val shouldBackup =
      !(priorFailedCount > 0 || priorSuccessCount + cluster.successCount != totalOpcoCount)
    val totalFailed = priorFailedCount + cluster.failureCount
    val status =
      if (cluster.failedOpcos.isEmpty &&
        priorSuccessCount + cluster.successCount == totalOpcoCount) Succeeded
      else if (totalFailed > 0 &&
        priorSuccessCount + priorFailedCount + cluster.successCount + cluster.failureCount == totalOpcoCount)
        Failed
      else Running
    Decision(status, shouldBackup)
  }
}
