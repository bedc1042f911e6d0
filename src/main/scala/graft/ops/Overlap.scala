package graft.ops

/** Overlap INDEPENDENT driver-side actions (optimization guide §2.6):
  * Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. Query harnesses that materialize several
  * serving-sized probe frames (collect → re-parallelize, the
  * collectProbeFrame recipe) pay each collect's full job latency
  * back-to-back; submitted from a bounded pool, the latencies overlap
  * and the wall cost is ~the slowest one. Result order is preserved
  * (futures are collected in input order), so downstream unions are
  * deterministic. Job submission is thread-safe; job descriptions are
  * thread-local, so concurrent jobs stay correctly labeled. */
object Overlap {

  /** `xs.map(f)` with the `f` bodies running concurrently on a bounded
    * (≤8-thread) pool. Use only when the bodies are independent — no
    * shared mutable state beyond thread-safe memo maps. */
  def map[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    if (xs.size <= 1) xs.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, xs.size))
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        Await.result(Future.sequence(xs.map(x => Future(f(x)))),
          scala.concurrent.duration.Duration.Inf)
      } finally pool.shutdown()
    }
  }
}
