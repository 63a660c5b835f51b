package graft.control

import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.control.TableRouter._

/** Branch-complete coverage of the control plane, mirroring the decision
  * paths of `/root/reference/src/price_zone/load_job.py:285-368` and the
  * admission lambda.
  */
class ControlPlaneSpec extends AnyFunSuite {

  private def store(
      futureEmpty: Boolean,
      fullExport: Boolean = false,
      softLevel: Int = 0): Store = new Store {
    def activeTable(o: String) = s"PRICE_ZONE_A_$o"
    def futureTable(o: String) = s"PRICE_ZONE_F_$o"
    def isEmpty(o: String, t: String) = futureEmpty
    def fullExportInProgress(o: String) = fullExport
    def softValidationLevel = softLevel
  }

  test("partial + future non-empty → load active then future") {
    assert(plan(partialLoad = true, "019", store(futureEmpty = false)) ===
      Seq(Load("PRICE_ZONE_A_019"), Load("PRICE_ZONE_F_019")))
  }

  test("partial + future empty + full export in progress → load both") {
    assert(plan(partialLoad = true, "019", store(futureEmpty = true, fullExport = true)) ===
      Seq(Load("PRICE_ZONE_A_019"), Load("PRICE_ZONE_F_019")))
  }

  test("partial + future empty + no export → active only, skip future") {
    val p = plan(partialLoad = true, "019", store(futureEmpty = true))
    assert(p.head === Load("PRICE_ZONE_A_019"))
    assert(p(1).isInstanceOf[Skip])
  }

  test("full + future empty → load future + effective-date watermark") {
    assert(plan(partialLoad = false, "019", store(futureEmpty = true)) ===
      Seq(Load("PRICE_ZONE_F_019"), UpdateEffectiveDate("PRICE_ZONE_F_019")))
  }

  test("full + future non-empty escalates by soft-validation level") {
    assertThrows[RoutingException] {
      plan(partialLoad = false, "019", store(futureEmpty = false, softLevel = 0))
    }
    assert(plan(partialLoad = false, "019", store(futureEmpty = false, softLevel = 1))
      .head.isInstanceOf[Skip])
    assert(plan(partialLoad = false, "019", store(futureEmpty = false, softLevel = 2)) ===
      Seq(Load("PRICE_ZONE_F_019")))
    assertThrows[RoutingException] {
      plan(partialLoad = false, "019", store(futureEmpty = false, softLevel = 7))
    }
  }

  test("runBounded honors max concurrency and captures failures") {
    val inFlight = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val results = RunPlanner.runBounded((1 to 12).toSeq, maxConcurrency = 2,
      RunPlanner.RetryPolicy(maxAttempts = 1, intervalMillis = 1)) { i =>
      val now = inFlight.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, now))
      Thread.sleep(20)
      inFlight.decrementAndGet()
      if (i == 7) throw new RuntimeException("boom") else i * 10
    }
    assert(maxSeen.get() <= 2)
    assert(results.count(_.result.isRight) === 11)
    val failed = results.find(_.result.isLeft).get
    assert(failed.item === 7)
  }

  test("runBounded retries with backoff until success") {
    val calls = new AtomicInteger(0)
    val r = RunPlanner.runBounded(Seq("x"), 1,
      RunPlanner.RetryPolicy(maxAttempts = 3, intervalMillis = 1, backoffRate = 2.0)) { _ =>
      if (calls.incrementAndGet() < 3) throw new RuntimeException("flaky") else "ok"
    }
    assert(r.head.result === Right("ok") && r.head.attempts === 3)
  }

  test("admission: FIFO rank with start-time then id tie-break") {
    val running = Seq(("exec-c", 100L), ("exec-a", 200L), ("exec-b", 100L))
    // order: (100, exec-b), (100, exec-c), (200, exec-a)
    assert(!Admission.shouldWait(running, "exec-b", 1))
    assert(Admission.shouldWait(running, "exec-c", 1))
    assert(!Admission.shouldWait(running, "exec-c", 2))
    assert(Admission.shouldWait(running, "exec-a", 2))
    assert(!Admission.shouldWait(running, "exec-a", 3))
  }
}
