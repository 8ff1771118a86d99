package graft.stream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ext.{EmbHistory, IvfPq}

/** Streaming VECTOR ingest — the [[IngestNearDedup]] move for the
  * embedding modality, completing the streaming dedup ladder across
  * all three (exact text → [[IngestDedup]], near-dup text →
  * [[IngestNearDedup]], vectors → here): each micro-batch of arriving
  * vectors probes the FROZEN embedding-dedup artifacts
  * ([[EmbHistory]] — history-trained coarse codebook + per-cell
  * vector lists) and appends TWO outputs per batch:
  *
  *  1. the near-dup manifest (vec_id, n_dups, dup_of, kept, batch_id)
  *     — [[graft.ext.Dedup.dedupEmbIncremental]]'s exact shape, same
  *     kernel, so stream ≡ batch is by construction (pinned in
  *     IngestVecDedupSpec);
  *  2. the KEPT vectors' IVF-PQ codes, encoded under the frozen
  *     codebooks ([[IvfPq.encodeWith]] — the incremental-ingest path)
  *     and appended into the standing cell-partitioned inverted-list
  *     layout, so the searchable index and the dedup history advance
  *     together; [[IvfPq.compactCodes]] absorbs the per-batch file
  *     fragmentation on the maintenance cadence.
  *
  * Why foreachBatch and not a stateful streaming op: vector history is
  * the CORPUS — every embedding ever kept, bucketed by cell. That does
  * not belong in a StateStore (state is per-key,
  * checkpoint-replicated, rewritten per batch); it belongs in
  * persisted artifacts each micro-batch PROBES. The plan here is
  * deliberately STATELESS — zero StateStore operators, pinned in
  * IngestVecDedupSpec — and state stays bounded by construction:
  * history lives in parquet, not in the stream.
  *
  * Per micro-batch the cost is the batch-side coarse ranking (the
  * codebook is a broadcast literal — O(k) per row) plus the probed
  * cells' exact-cosine verify, with history only ever streamed through
  * joins built from the batch side ([[EmbHistory.manifestAgainst]]'s
  * contract). A long-lived driver passes [[EmbHistory.pinned]]
  * artifacts so the per-batch history read is a cache hit, not a
  * parquet re-scan.
  *
  * Pin lifecycle: the kernel's internal persists (the batch frame, the
  * probe set, the verified build side, the encode input) are tracked
  * PER BATCH and unpersisted after the batch's writes land — a soak
  * runs hundreds of batches, and session-scoped pins would accumulate
  * unboundedly (asserted zero-accumulation in IngestVecDedupSpec).
  */
object IngestVecDedup {

  /** The foreachBatch micro-pipeline: per micro-batch of
    * (vec_id, v double[]), probe against `hist` and append the
    * manifest (vec_id, n_dups, dup_of, kept, batch_id) to
    * `manifestPath`; then encode the KEPT vectors under the frozen PQ
    * codebooks and append their codes into `codesPath`'s
    * cell-partitioned layout. The writer is returned un-started
    * ([[Sinks]]' lifecycle convention). */
  def manifestSink(vecs: DataFrame, hist: EmbHistory.Artifacts,
                   manifestPath: String, codesPath: String,
                   checkpoint: String, probeCells: Int = 2,
                   cosineMin: Double = 0.3): DataStreamWriter[Row] =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, hist, manifestPath, codesPath,
          probeCells, cosineMin)
      }

  /** One micro-batch's probe + two writes — the foreachBatch body,
    * factored out so IngestVecDedupSpec can REPLAY a batch (same
    * content, same batchId) and assert the writes are idempotent. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                  hist: EmbHistory.Artifacts,
                                  manifestPath: String, codesPath: String,
                                  probeCells: Int,
                                  cosineMin: Double): Unit = {
    val ephemeral = ArrayBuffer.empty[DataFrame]
    val track = (df: DataFrame) => {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      ephemeral += p
      p
    }
    try {
      val b = track(EmbHistory.withNorm(batch.select(col("vec_id"),
        col("v"))))
      val manifest = track(
        EmbHistory.manifestAgainst(b, hist.coarse, hist.vectors,
          probeCells, cosineMin, track))
      // IDEMPOTENT per-batch writes (r20 ADVICE): foreachBatch is
      // at-least-once — a restart between the two writes below
      // replays the batch, and a plain append would duplicate
      // manifest rows and double-append codes into the searchable
      // index. Both outputs are therefore batch-KEYED and written
      // with dynamic partition overwrite: a replay rewrites exactly
      // its own batch_id partitions with identical content (the
      // standard foreachBatch exactly-once recipe), so no reader
      // ever needs to dedupe. `ivf_cell` stays the leading codes
      // partition level, so file-level cell pruning is unchanged;
      // [[IvfPq.compactCodes]] drops the batch_id level on its
      // maintenance cadence, which is safe precisely because
      // overwrite semantics mean duplicates never exist.
      manifest.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(manifestPath)
      // the corpus grows by the kept vectors: encode them under the
      // frozen codebooks and append into the inverted-list layout —
      // manifest is already materialized (persisted by the write
      // above), so the kept-side join re-reads cache, not the probe
      IvfPq.encodeWith(
          b.join(manifest.filter(col("kept")).select(col("vec_id")),
                 "vec_id")
            .select(col("vec_id"), col("v")),
          hist.coarse, hist.codebooks, graft.ext.Pq.NumSubs, track)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ivf_cell", "batch_id")
        .parquet(codesPath)
    } finally ephemeral.foreach(_.unpersist(blocking = false))
  }
}
