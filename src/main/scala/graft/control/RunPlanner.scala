package graft.control

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

/** O1/O2 — orchestration fan-out (SURVEY.md §2.10): the Step Function
  * Map state over the opco partition list with `MaxConcurrency` and
  * per-item retry/backoff
  * (`/root/reference/src/price_zone/etl_controller_step_function.json:23-69`),
  * as a driver-side bounded executor. Partition planning itself is a
  * one-line DataFrame op (`validDf.select(key).distinct()`) — the
  * reference's S3-prefix listing lambda
  * (`/root/reference/src/FetchFileListLambda/index.py:121-153`) is
  * obviated by Spark partition discovery.
  */
object RunPlanner {

  /** Map-state retry contract: attempts, initial interval, backoff rate
    * (reference: 2 attempts, 3 s, ×10). */
  final case class RetryPolicy(
      maxAttempts: Int = 2,
      intervalMillis: Long = 3000L,
      backoffRate: Double = 10.0)

  final case class ItemResult[A, B](item: A, result: Either[Throwable, B], attempts: Int)

  private def withRetry[B](policy: RetryPolicy)(f: => B): (Either[Throwable, B], Int) = {
    var attempt = 0
    var wait = policy.intervalMillis
    var last: Throwable = null
    while (attempt < policy.maxAttempts) {
      attempt += 1
      Try(f) match {
        case Success(b) => return (Right(b), attempt)
        case Failure(e) =>
          last = e
          if (attempt < policy.maxAttempts) { Thread.sleep(wait); wait = (wait * policy.backoffRate).toLong }
      }
    }
    (Left(last), attempt)
  }

  /** Run `f` over `items` with at most `maxConcurrency` in flight,
    * retrying each item per `policy`. Item failures are captured, not
    * thrown (the Map state's Catch → mark-failed path). */
  def runBounded[A, B](
      items: Seq[A],
      maxConcurrency: Int,
      policy: RetryPolicy = RetryPolicy())(f: A => B): Seq[ItemResult[A, B]] = {
    require(maxConcurrency > 0, "maxConcurrency must be > 0")
    val pool = Executors.newFixedThreadPool(maxConcurrency)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = items.map { a =>
        Future {
          val (r, attempts) = withRetry(policy)(f(a))
          ItemResult(a, r, attempts)
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()
  }
}

/** Concurrency admission (SURVEY.md §2.9): FIFO by start time with
  * execution-id tie-break — the reference's shouldWait polling decision
  * (`/root/reference/src/AnalyzeEtlWaitStatusLambda/index.py:99-139`,
  * duplicated at
  * `/root/reference/src/pa/PAAnalyzeWaitOrLoadClusterLambda/index.py:122-158`).
  * In Spark terms this is `row_number() OVER (ORDER BY start_time, id)`.
  */
object Admission {

  /** True when `self` must keep waiting: its FIFO rank among running
    * executions exceeds `maxConcurrency`. */
  def shouldWait(
      running: Seq[(String, Long)],
      self: String,
      maxConcurrency: Int): Boolean = {
    require(maxConcurrency > 0, "maxConcurrency must be > 0")
    val rank = running.sortBy { case (id, start) => (start, id) }
      .indexWhere(_._1 == self) + 1
    require(rank > 0, s"execution $self not in running set")
    rank > maxConcurrency
  }
}
