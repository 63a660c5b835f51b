package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins the plan-audit coverage policy mechanically (VERDICT r6 item
  * 5): every BATCH gate whose bench median exceeds 1s must have
  * a headline plan in PLANS.md (i.e. appear in [[DumpPlans.headline]]),
  * so plan coverage can't silently lag as the suite grows. Streaming
  * gates (`st*`) have no batch plan — their shape of record is
  * PLANS.md's streaming section, maintained prose.
  *
  * FLAP CLASS (VERDICT r8 item 1): the driver's bench runs all 352
  * gates in one JVM, so a slow bench-day host can inflate a ~0.6s
  * gate over the 1s line and redden this spec without any plan change
  * (r8: v4_final_records, x38_holt_forecast; mid-r8: st21). The policy
  * is therefore asserted with hysteresis on two legs:
  *   - the 1.0s line is checked against `bench_medians_snapshot.json`,
  *     a COMMITTED snapshot refreshed whenever PLANS.md is regenerated
  *     — deterministic, so host speed cannot flap it;
  *   - the live `bench_detail.json` is checked at 1.5s (50% drift
  *     margin), so a genuinely new heavy gate still fails the build
  *     even before the snapshot is refreshed.
  * Headline coverage itself extends down to ~0.7s for extra margin.
  * Parsing uses json4s, which Spark already ships.
  */
class PlanCoverageSpec extends AnyFunSuite {

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def loadTimes(path: String, field: String): Map[String, Seq[Double]] = {
    val json = JsonMethods.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    (json \ field) match {
      case JObject(fields) => fields.collect {
        case (name, JArray(vs)) if vs.nonEmpty =>
          name -> vs.collect { case JDouble(d) => d
                               case JInt(i) => i.toDouble }
        case (name, JDouble(d)) => name -> Seq(d)
        case (name, JInt(i))    => name -> Seq(i.toDouble)
      }.toMap
      case _ => fail(s"$path has no $field object")
    }
  }
  private def median(ts: Seq[Double]): Double = { val s = ts.sorted; s(s.length / 2) }

  test("every batch gate with bench median >1s has a headline plan") {
    val snap = new java.io.File("bench_medians_snapshot.json")
    assume(snap.isFile, "bench_medians_snapshot.json not present (fresh checkout)")
    val headline = DumpPlans.headline.toSet
    val gates = graft.SparkEntry.queries.keySet

    // leg 1: committed snapshot at the 1.0s policy line (can't flap)
    val snapMeds = loadTimes(snap.getPath, "medians")
    val uncoveredSnap = snapMeds.collect {
      case (name, ts)
          if !name.startsWith("st") && median(ts) > 1.0 &&
            gates(name) && !headline(name) => f"$name (${median(ts)}%.2f s)"
    }
    assert(uncoveredSnap.isEmpty,
      s"snapshot gates >1s without a headline plan: ${uncoveredSnap.mkString(", ")}" +
        " — add them to DumpPlans.headline and regenerate PLANS.md")

    // leg 2: live bench at 1.5s (drift margin; catches new heavies
    // added since the snapshot)
    val live = new java.io.File("bench_detail.json")
    val times = if (live.isFile) loadTimes(live.getPath, "times") else Map.empty[String, Seq[Double]]
    val uncovered = times.collect {
      case (name, ts)
          if !name.startsWith("st") && median(ts) > 1.5 &&
            gates(name) && !headline(name) => f"$name (${median(ts)}%.2f s)"
    }
    assert(uncovered.isEmpty,
      s"live bench gates >1.5s without a headline plan: ${uncovered.mkString(", ")}" +
        " — add them to DumpPlans.headline, regenerate PLANS.md, refresh the snapshot")
    // and the list itself must stay valid — every headline name is a gate
    val stale = DumpPlans.headline.filterNot(gates)
    assert(stale.isEmpty, s"headline entries that are not gates: $stale")

    // Streaming twin of the same policy (VERDICT r7 item 1): every
    // STREAMING gate with a bench median >2s must be in the
    // state-audit list — per-micro-batch StateOperatorProgress is the
    // streaming side's executed-plan equivalent, and this keeps
    // STATE_SF01.md's coverage from lagging as the suite grows.
    // Same hysteresis (snapshot at 2s, live at 3s) — st21 flapped this
    // exact way mid-r8.
    val audited = DumpStreamState.defaultGates.toSet
    val unauditedStreams = (snapMeds.collect {
      case (name, ts)
          if name.startsWith("st") && median(ts) > 2.0 &&
            gates(name) && !audited(name) => f"$name (snapshot ${median(ts)}%.2f s)"
    } ++ times.collect {
      case (name, ts)
          if name.startsWith("st") && median(ts) > 3.0 &&
            gates(name) && !audited(name) => f"$name (live ${median(ts)}%.2f s)"
    }).toSeq.distinct
    assert(unauditedStreams.isEmpty,
      s"streaming gates over the audit line without a state audit: ${unauditedStreams.mkString(", ")}" +
        " — add them to DumpStreamState.defaultGates and regenerate STATE_SF01.md")
    val staleStreams = DumpStreamState.defaultGates.filterNot(gates)
    assert(staleStreams.isEmpty,
      s"state-audit entries that are not gates: $staleStreams")
  }
}
