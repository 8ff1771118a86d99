package graft

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped ownership for the engine's internal `persist`s.
  *
  * A handful of operators (the dedup LSH family, Quality.coverageGaps)
  * must persist a multi-consumer subframe — Spark re-executes a shared
  * subplan once per plan reference, and for those operators the recompute
  * is the dominant cost (SURVEY §4). But `persist` outlives the query: the
  * frame sits in the session's CacheManager until someone unpersists it.
  * Through r13 that someone was prose — "harnesses call `clearCache()`
  * between queries" — which a library caller composing many dedup plans in
  * one session had to know to imitate (r12/r13 ADVICE flagged exactly
  * this).
  *
  * This object makes the contract enforceable instead of documented:
  * every internal persist routes through [[pin]], which registers the
  * frame in a per-session ledger, and
  *
  *  - [[scoped]] — `CacheScope.scoped(spark) { runQueries() }` —
  *    releases everything pinned in the session when the block exits,
  *    however it exits. The intended library API: build plans AND run
  *    their actions inside the scope (the pins are consumed at action
  *    time, so the scope must cover the action, not just plan
  *    construction).
  *  - [[release]] — the imperative spelling, for harnesses with their own
  *    lifecycle (Bench/Verify call it between queries, alongside the
  *    `clearCache()` they already did — unpersist on an already-cleared
  *    frame is a no-op, so the two compose).
  *  - [[livePinned]] — observability for specs: DedupArtifactSpec asserts
  *    the ledger AND the session CacheManager are empty after a scoped
  *    run, so a new leaked persist fails a test instead of a review.
  *
  * Unpersist is non-blocking: entries leave the CacheManager
  * synchronously; block eviction proceeds async, which is the right
  * trade for a between-queries release.
  */
object CacheScope {

  private val ledger =
    new ConcurrentHashMap[SparkSession, ConcurrentLinkedQueue[DataFrame]]()

  /** Persist `df` (MEMORY_AND_DISK) and register it for session-scoped
    * release. Internal operators use this instead of raw `.persist`. */
  private[graft] def pin(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    ledger.computeIfAbsent(p.sparkSession,
      _ => new ConcurrentLinkedQueue[DataFrame]()).add(p)
    p
  }

  /** Unpersist every frame pinned in `spark` since the last release;
    * returns how many were released. */
  def release(spark: SparkSession): Int = {
    val q = ledger.remove(spark)
    if (q == null) 0
    else {
      var n = 0
      q.forEach { df => df.unpersist(blocking = false); n += 1 }
      n
    }
  }

  /** Number of currently pinned (unreleased) frames in `spark`. */
  def livePinned(spark: SparkSession): Int = {
    val q = ledger.get(spark)
    if (q == null) 0 else q.size()
  }

  /** Run `body`, then release every frame it pinned — the safe way to
    * compose multiple cache-pinning operators in one session. */
  def scoped[T](spark: SparkSession)(body: => T): T =
    try body finally release(spark)
}
