package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Overlap INDEPENDENT eager Spark pipelines from the driver (guide
  * §2.6): Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. Several composed operators ([[ext.Funnel]]'s flag
  * pipelines) eagerly materialize internal artifacts during PLAN
  * CONSTRUCTION (cache-fill counts, localCheckpoints, bloom builds);
  * when two such pipelines share no data dependency, constructing them
  * from two driver threads lets the second pipeline's jobs back-fill
  * the cores the first one's small-stage tail leaves idle — the funnel
  * family's profile is exactly this serialized-job shape (8-vs-32-core
  * ratio ≈ 1.0: latency-bound, not compute-bound).
  *
  * Plans, row values, and caching are UNCHANGED — only the driver's
  * job submission order differs; FIFO scheduling keeps earlier jobs'
  * priority. Safe because every structure the pipelines touch is
  * concurrent ([[CacheScope]]'s ledger, Spark's CacheManager and
  * scheduler); the blocks passed here must not read each other's
  * frames (enforced by review, asserted per call site).
  */
object Par {
  def together[A, B](a: => A, b: => B): (A, B) = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fa = Future(a)
    val fb = Future(b)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }
}
