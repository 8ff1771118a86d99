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
  * apply = exactly-once snapshot state. The swap itself is
  * write-to-side-dir + rename: readers of `snapshotDir` see the old
  * complete snapshot or the new complete snapshot, never a partial
  * write (rename is atomic on HDFS-like stores; object stores swap a
  * pointer instead — same shape).
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
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base =
      if (fs.exists(dir)) spark.read.parquet(snapshotDir)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], changes.schema)
    val merged = Cdc.cdcMerge(base, changes, keys, ordering, isDelete)
    // side-dir then swap: the tmp write is what READS the old snapshot,
    // so the old dir must stay intact until the write completes
    val tmp = new Path(snapshotDir + "__applying")
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dir, true)
    fs.rename(tmp, dir)
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
