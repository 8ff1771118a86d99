package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static dimension enrichment — the join every live pipeline
  * runs to attach reference data (instrument metadata, user segments,
  * currency tables) to an event stream. The static side is a bounded
  * DataFrame (a dim table); Spark re-resolves and re-plans it EVERY
  * micro-batch, which is the semantics slowly-changing dims want when
  * the static side is a file/catalog source: updates to the dim table
  * are picked up at the next batch without restarting the query.
  *
  * Scale posture: stream-static inner/left joins are STATELESS — no
  * state store, no watermark requirement (unlike the stream-stream
  * [[IntervalJoin]], whose symmetric-hash state both sides must bound).
  * The dim side is broadcast, so stream micro-batches are never
  * shuffled for the join — per-batch cost is a map-side hash lookup.
  * If a dim outgrows the broadcast threshold, drop the hint and Spark
  * shuffles the MICRO-BATCH (bounded) against the dim — correct but
  * per-batch-shuffle-priced; at that size prefer pre-bucketing the dim
  * ([[graft.ops.Bucketing]]).
  *
  * Left join keeps events with no dim row (the unenriched-but-kept
  * contract a lossy feed needs); IncrementalSpec pins both the
  * enrichment values and the no-state-store property.
  */
object StaticEnrich {

  /** stream(joinKey, …) ⟕ broadcast(dim(joinKey, …)). */
  def enrich(stream: DataFrame, dim: DataFrame, joinKey: String): DataFrame =
    stream.join(broadcast(dim), Seq(joinKey), "left")
}
