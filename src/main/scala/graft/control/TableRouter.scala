package graft.control

/** ACTIVE/FUTURE table routing — the reference's stateful load decision
  * tree (`/root/reference/src/price_zone/load_job.py:285-368`,
  * `find_tables_to_load`), modeled as a pure function over an injectable
  * metadata store so every branch is testable without a database.
  *
  * Reference semantics:
  *  - PARTIAL load: always load ACTIVE; then load FUTURE iff FUTURE is
  *    non-empty, or FUTURE is empty but a full export is in progress for
  *    this opco (`load_job.py:304-345`).
  *  - FULL load: FUTURE empty → load FUTURE + write its min effective
  *    date to the master table (`load_job.py:346-357`); FUTURE
  *    non-empty → escalate by soft-validation level 0/1/2
  *    (`load_job.py:285-301`): 0 = hard error, 1 = skip with note,
  *    2 = load FUTURE anyway.
  */
object TableRouter {

  sealed trait Action
  final case class Load(table: String) extends Action
  final case class UpdateEffectiveDate(fromTable: String) extends Action
  final case class Skip(reason: String) extends Action

  final class RoutingException(msg: String) extends RuntimeException(msg)

  /** Injectable state — DB lookups in the reference. */
  trait Store {
    def activeTable(opco: String): String
    def futureTable(opco: String): String
    def isEmpty(opco: String, table: String): Boolean
    def fullExportInProgress(opco: String): Boolean
    def softValidationLevel: Int
  }

  /** The load plan for one opco. Throws [[RoutingException]] exactly
    * where the reference raises. */
  def plan(partialLoad: Boolean, opco: String, store: Store): Seq[Action] = {
    val future = store.futureTable(opco)
    if (partialLoad) {
      val active = store.activeTable(opco)
      val head = Seq(Load(active))
      if (!store.isEmpty(opco, future)) head :+ Load(future)
      else if (store.fullExportInProgress(opco)) head :+ Load(future)
      else head :+ Skip("future empty and no full export in progress")
    } else {
      if (store.isEmpty(opco, future))
        Seq(Load(future), UpdateEffectiveDate(future))
      else store.softValidationLevel match {
        case 0 => throw new RoutingException("full load and future table is not empty")
        case 1 => Seq(Skip(s"future non-empty, soft validation skips opco $opco"))
        case 2 => Seq(Load(future))
        case _ => throw new RoutingException("full load and future table is not empty")
      }
    }
  }
}
