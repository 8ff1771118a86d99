package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.CdcApply

/** [[graft.stream.CdcApply]] end-to-end over MemoryStream: the snapshot
  * tracks the changelog across micro-batches, survives a query restart
  * from the checkpoint, and re-applying a batch is a no-op (the
  * exactly-once-by-idempotence claim, exercised directly). */
class CdcApplySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val keys = Seq("k")
  private def ordering = Seq(col("ver").desc)
  private def isDelete = col("op") === "D"

  private def snapshot(dir: String): Set[(Long, Long, Double)] =
    spark.read.parquet(dir).select("k", "ver", "v")
      .as[(Long, Long, Double)].collect().toSet

  test("changelog stream folds into the snapshot across batches and restarts") {
    val input = MemoryStream[(Long, Long, String, Double)]
    val changes = input.toDF().toDF("k", "ver", "op", "v")
    val snap = Files.createTempDirectory("graft_cdc_snap").toString + "/s"
    val ckpt = Files.createTempDirectory("graft_cdc_ckpt").toString
    def start() = CdcApply.snapshotSink(changes, snap, ckpt,
                                        keys, ordering, isDelete).start()

    val q1 = start()
    try {
      input.addData((1L, 10L, "U", 1.0), (2L, 10L, "U", 2.0))
      q1.processAllAvailable()
      assert(snapshot(snap) === Set((1L, 10L, 1.0), (2L, 10L, 2.0)))
      input.addData((1L, 20L, "U", 1.5), (2L, 20L, "D", 0.0),
                    (3L, 20L, "U", 3.0))
      q1.processAllAvailable()
      assert(snapshot(snap) === Set((1L, 20L, 1.5), (3L, 20L, 3.0)))
    } finally q1.stop()

    // restart from the same checkpoint: committed batches must NOT
    // re-apply, new data must
    val q2 = start()
    try {
      input.addData((3L, 30L, "D", 0.0), (4L, 30L, "U", 4.0))
      q2.processAllAvailable()
      assert(snapshot(snap) === Set((1L, 20L, 1.5), (4L, 30L, 4.0)))
    } finally q2.stop()
  }

  test("swap crash windows are repaired: no key is ever lost") {
    import org.apache.hadoop.fs.Path
    val snap = Files.createTempDirectory("graft_cdc_crash").toString + "/s"
    val fs = new Path(snap).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def apply(rows: (Long, Long, String, Double)*): Unit =
      CdcApply.applyBatch(spark, snap, rows.toDF("k", "ver", "op", "v"),
                          keys, ordering, isDelete)

    apply((1L, 10L, "U", 1.0), (2L, 10L, "U", 2.0))
    // window A: died between rename-aside and rename-in — live dir is
    // MISSING, the only complete snapshot sits at __old. Under the old
    // delete-then-rename protocol this state meant total loss.
    assert(fs.rename(new Path(snap), new Path(snap + "__old")))
    apply((3L, 20L, "U", 3.0)) // the replayed batch
    assert(snapshot(snap) === Set((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 20L, 3.0)))

    // window B: died between rename-in and the cleanup delete — a stale
    // __old copy sits beside the live dir and must be dropped, not read.
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new Path(snap), fs, new Path(snap + "__old"), false,
      spark.sparkContext.hadoopConfiguration)
    apply((1L, 30L, "D", 0.0))
    assert(snapshot(snap) === Set((2L, 10L, 2.0), (3L, 20L, 3.0)))
    assert(!fs.exists(new Path(snap + "__old")))
  }

  test("re-applying an already-folded batch is a no-op (idempotent apply)") {
    val snap = Files.createTempDirectory("graft_cdc_re").toString + "/s"
    val b1 = Seq((1L, 10L, "U", 1.0), (2L, 20L, "D", 0.0))
      .toDF("k", "ver", "op", "v")
    CdcApply.applyBatch(spark, snap, b1, keys, ordering, isDelete)
    val first = snapshot(snap)
    CdcApply.applyBatch(spark, snap, b1, keys, ordering, isDelete) // retry
    assert(snapshot(snap) === first)
    assert(first === Set((1L, 10L, 1.0)))
  }
}
