package graft.ops

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-side concurrent submission of INDEPENDENT Spark actions.
  *
  * Many index builds decompose into several metadata-sized jobs over the
  * same cached input (per-subspace codebook aggregations, per-path ANN
  * probes). Each job alone has too few partitions to fill the cluster, and
  * much of its wall-clock is driver-side plan analysis — both overlap
  * safely across threads, so submitting all N from a small pool costs
  * ~max(job) instead of sum(job). This is the standard Spark multi-job
  * pattern (the scheduler is thread-safe; FAIR/FIFO pools interleave
  * stages from concurrent submitters).
  *
  * Results return in INPUT order (futures are awaited in declaration
  * order), so callers that fold results stay deterministic. `f` must not
  * mutate shared state; memoized upstream views are safe because their
  * ConcurrentHashMap computeIfAbsent guards build-once semantics.
  *
  * The pool is CAPPED at [[MaxConcurrency]] regardless of `items.size`:
  * each thread submits whole Spark jobs, and an uncapped pool handed a
  * per-bucket or per-source list would flood the scheduler with hundreds
  * of concurrent actions (driver memory for N live plan analyses, and
  * job-level convoying on the executor slots). Excess items queue and run
  * as threads free up — same results, bounded driver footprint.
  */
object Par {

  /** Upper bound on concurrently submitted Spark actions. */
  val MaxConcurrency = 8

  def map[A, B](items: Seq[A])(f: A => B): Seq[B] =
    if (items.sizeIs <= 1) items.map(f)
    else {
      val pool = Executors.newFixedThreadPool(math.min(items.size, MaxConcurrency))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try {
        val futs = items.map(a => Future(f(a)))
        futs.map(Await.result(_, Duration.Inf))
      } finally pool.shutdown()
    }
}
