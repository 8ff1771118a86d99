package graft.stream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ext.DedupHistory

/** Streaming NEAR-dup ingest — the missing rung of the streaming dedup
  * ladder: exact dedup streams with watermark-bounded state
  * ([[IngestDedup]]), and near-dup now streams as a foreachBatch
  * micro-pipeline against FROZEN history artifacts
  * ([[DedupHistory]]) — the [[CurationPipeline]] batch-kernel pattern
  * applied to X84's bloom→band→verify funnel.
  *
  * Why foreachBatch and not a stateful streaming op: near-dup history
  * is the CORPUS — banded signatures and shingle sets for every
  * document ever kept. That does not belong in a StateStore (state is
  * per-key, checkpoint-replicated, and rewritten per batch); it
  * belongs in persisted artifacts that each micro-batch PROBES. So the
  * plan here is deliberately STATELESS — zero StateStore operators,
  * pinned in IngestNearDedupSpec — and state stays bounded by
  * construction: history lives in parquet, not in the stream.
  *
  * Per micro-batch the cost is the batch-side funnel (shingle + md5 the
  * new docs, bloom-test their band keys) plus history probed through
  * build-side joins — history never re-shuffles for a batch
  * ([[DedupHistory.manifestAgainst]]'s contract). A long-lived driver
  * passes [[DedupHistory.pinned]] artifacts so the per-batch history
  * read is a cache hit, not a parquet re-scan.
  *
  * Pin lifecycle: the kernel's internal persists (batch shingles,
  * bands, the two candidate build sides) are tracked PER BATCH and
  * unpersisted after the batch's write lands — a 10-minute soak runs
  * hundreds of batches, and session-scoped pins would accumulate
  * unboundedly (asserted empty after the run in IngestNearDedupSpec).
  *
  * Composes after [[IngestDedup.exactWithinWatermark]] for the full
  * ingest story — exact dups drop in-flight (the one stateful op),
  * near-dups manifest against history here.
  */
object IngestNearDedup {

  /** The foreachBatch micro-pipeline: per micro-batch of
    * (doc_id, text), probe against `hist` and append the manifest
    * (doc_id, n_dups, dup_of, kept, batch_id) to `path`. The writer is
    * returned un-started ([[Sinks]]' lifecycle convention). */
  def manifestSink(docs: DataFrame, hist: DedupHistory.Artifacts,
                   path: String, checkpoint: String,
                   jaccardMin: Double = 0.5): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ephemeral = ArrayBuffer.empty[DataFrame]
        val track = (df: DataFrame) => {
          val p = df.persist(StorageLevel.MEMORY_AND_DISK)
          ephemeral += p
          p
        }
        try
          DedupHistory.manifestAgainst(batch, hist, jaccardMin, track)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(path)
        finally ephemeral.foreach(_.unpersist(blocking = false))
      }
}
