package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.Cdc

/** Continuous CDC apply — the streaming shell around [[Cdc.cdcMerge]]:
  * a changelog STREAM folded into a queryable parquet snapshot, one
  * micro-batch at a time. This is the lakehouse "apply changes" loop
  * (Debezium topic → silver table) built from the engine's own batch
  * merge kernel, so stream- and batch-merged snapshots agree by
  * construction.
  *
  * Exactly-once without a transactional table format: foreachBatch is
  * AT-LEAST-once (a batch can re-run after a crash), but
  * [[Cdc.cdcMerge]] is IDEMPOTENT (pinned in CdcSpec) — re-folding the
  * same change rows into a snapshot that already contains them changes
  * nothing, because each key's max-version row is already present and
  * row_number keeps exactly it. At-least-once delivery + idempotent
  * apply = exactly-once snapshot state.
  *
  * The swap is a CRASH-RECOVERABLE three-step rename protocol, never a
  * delete of the only copy: write the merged snapshot to a side dir
  * (`__applying`), rename the live dir aside (`__old`), rename the side
  * dir into place, then delete `__old`. A complete copy of the snapshot
  * exists on disk at every instant, so a crash in ANY window loses
  * nothing: [[applyBatch]] starts by repairing leftover state — live
  * missing + `__old` present (died between the two renames) renames
  * `__old` back; live present + `__old` present (died before the
  * cleanup delete) drops the stale `__old` — and the replayed batch
  * then re-applies idempotently. Readers that race the two renames can
  * observe a missing dir for the rename-pair instant and should retry;
  * on object stores the same shape is versioned snapshot dirs behind an
  * atomically-written pointer file (rename is atomic on HDFS-like
  * stores, not on S3).
  *
  * Tombstone horizon: the merged snapshot DROPS deleted keys, so a
  * change batch that arrives with an OLDER version than an already-
  * applied delete would resurrect the key. That is safe exactly when
  * the changelog is per-key ordered across batches — which a keyed
  * Kafka topic (the standard Debezium layout) guarantees. For unordered
  * sources, keep tombstones as rows (drop the isDelete filter from the
  * stored snapshot and apply it at read) until a retention horizon
  * passes, the same contract Kafka compaction uses.
  *
  * Scale: the simple form below rewrites the WHOLE snapshot per batch —
  * correct at any size but O(snapshot) of IO per trigger. At 100 TB the
  * snapshot is date/bucket-partitioned and the merge output is written
  * with dynamic partition overwrite, so a batch rewrites only the
  * partitions its keys touch (the posture DynamicOverwriteSpec pins for
  * the batch backfill path); the merge kernel and the idempotence
  * argument are unchanged.
  */
object CdcApply {

  /** Fold one (batch) changelog frame into the parquet snapshot at
    * `snapshotDir`. Shared by the streaming sink and direct callers. */
  def applyBatch(spark: SparkSession, snapshotDir: String, changes: DataFrame,
                 keys: Seq[String], ordering: Seq[Column],
                 isDelete: Column): Unit = {
    val dir = new Path(snapshotDir)
    val old = new Path(snapshotDir + "__old")
    val tmp = new Path(snapshotDir + "__applying")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // repair a half-finished swap from a crashed predecessor BEFORE
    // reading the base — the protocol guarantees a complete snapshot
    // exists under exactly one of {dir, old}
    if (!fs.exists(dir) && fs.exists(old)) fs.rename(old, dir)
    else if (fs.exists(old)) fs.delete(old, true)
    val base =
      if (fs.exists(dir)) spark.read.parquet(snapshotDir)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], changes.schema)
    val merged = Cdc.cdcMerge(base, changes, keys, ordering, isDelete)
    // side-dir then swap: the tmp write is what READS the old snapshot,
    // so the live dir must stay intact until the write completes
    // (mode overwrite also clears any stale __applying from a crash)
    merged.write.mode("overwrite").parquet(tmp.toString)
    // aside-rename, never delete-then-rename: a complete copy survives
    // every crash window (repaired at the top of the next apply)
    if (fs.exists(dir)) fs.rename(dir, old)
    fs.rename(tmp, dir)
    fs.delete(old, true)
  }

  /** Streaming sink: every micro-batch of `changes` is folded into the
    * snapshot. Offsets commit to `checkpoint` AFTER the swap, so a
    * crash between swap and commit re-applies the batch — harmless by
    * idempotence. */
  def snapshotSink(changes: DataFrame, snapshotDir: String, checkpoint: String,
                   keys: Seq[String], ordering: Seq[Column],
                   isDelete: Column): DataStreamWriter[Row] =
    changes.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, snapshotDir, batch,
                   keys, ordering, isDelete)
      }
}
