package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins the plan-audit coverage policy mechanically (VERDICT r6 item
  * 5): every BATCH gate whose latest bench median exceeds 1s must have
  * a headline plan in PLANS.md (i.e. appear in [[DumpPlans.headline]]),
  * so plan coverage can't silently lag as the suite grows. Streaming
  * gates (`st*`) have no batch plan — their shape of record is
  * PLANS.md's streaming section, maintained prose.
  *
  * The medians come from `bench_detail.json` at the repo root — the
  * most recent full-suite run (the driver refreshes it every round).
  * Parsing uses json4s, which Spark already ships.
  */
class PlanCoverageSpec extends AnyFunSuite {

  test("every batch gate with bench median >1s has a headline plan") {
    val f = new java.io.File("bench_detail.json")
    assume(f.isFile, "bench_detail.json not present (fresh checkout)")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val json = JsonMethods.parse(java.nio.file.Files.readString(f.toPath))
    val times = (json \ "times") match {
      case JObject(fields) => fields.collect {
        case (name, JArray(vs)) if vs.nonEmpty =>
          name -> vs.collect { case JDouble(d) => d
                               case JInt(i) => i.toDouble }
      }
      case _ => fail("bench_detail.json has no times object")
    }
    def median(ts: Seq[Double]): Double = { val s = ts.sorted; s(s.length / 2) }
    val headline = DumpPlans.headline.toSet
    val gates = graft.SparkEntry.queries.keySet
    val uncovered = times.collect {
      case (name, ts)
          if !name.startsWith("st") && median(ts) > 1.0 &&
            gates(name) && !headline(name) => f"$name (${median(ts)}%.2f s)"
    }
    assert(uncovered.isEmpty,
      s"bench gates >1s without a headline plan: ${uncovered.mkString(", ")}" +
        " — add them to DumpPlans.headline and regenerate PLANS.md")
    // and the list itself must stay valid — every headline name is a gate
    val stale = DumpPlans.headline.filterNot(gates)
    assert(stale.isEmpty, s"headline entries that are not gates: $stale")

    // Streaming twin of the same policy (VERDICT r7 item 1): every
    // STREAMING gate with a bench median >2s must be in the
    // state-audit list — per-micro-batch StateOperatorProgress is the
    // streaming side's executed-plan equivalent, and this keeps
    // STATE_SF01.md's coverage from lagging as the suite grows.
    val audited = DumpStreamState.defaultGates.toSet
    val unauditedStreams = times.collect {
      case (name, ts)
          if name.startsWith("st") && median(ts) > 2.0 &&
            gates(name) && !audited(name) => f"$name (${median(ts)}%.2f s)"
    }
    assert(unauditedStreams.isEmpty,
      s"streaming gates >2s without a state audit: ${unauditedStreams.mkString(", ")}" +
        " — add them to DumpStreamState.defaultGates and regenerate STATE_SF01.md")
    val staleStreams = DumpStreamState.defaultGates.filterNot(gates)
    assert(staleStreams.isEmpty,
      s"state-audit entries that are not gates: $staleStreams")
  }
}
