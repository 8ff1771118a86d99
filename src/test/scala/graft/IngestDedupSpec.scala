package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.IngestDedup

/** Streaming exact-dedup semantics DuckDB cannot oracle: duplicates
  * within the watermark horizon are dropped (across micro-batches too),
  * state is evicted after the horizon, and an out-of-horizon repeat is
  * re-admitted — the documented stream/batch dedup split. */
class IngestDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val T0 = 1705309200000L // 2024-01-15 09:00:00 UTC

  test("in-horizon duplicates drop; out-of-horizon repeats re-admit") {
    val input = MemoryStream[(Timestamp, String)]
    val deduped = IngestDedup.exactWithinWatermark(
      input.toDF().toDF("ts", "text"), tsCol = "ts", horizon = "1 minute")
    val query = deduped.writeStream
      .format("memory").queryName("ingest_dedup").outputMode("append")
      .option("checkpointLocation",
              Files.createTempDirectory("graft_dedup_ckpt").toString)
      .start()
    def rows() = spark.table("ingest_dedup")
      .select("text").as[String].collect().toSeq

    try {
      // batch 1: same text twice in one batch + one unique
      input.addData(
        (new Timestamp(T0), "the quick brown fox"),
        (new Timestamp(T0 + 1000), "the quick brown fox"),
        (new Timestamp(T0 + 2000), "an entirely different doc"))
      query.processAllAvailable()
      assert(rows().sorted === Seq("an entirely different doc", "the quick brown fox"))

      // batch 2: the same text again, still within the horizon → dropped
      // ACROSS batches (state carries over)
      input.addData((new Timestamp(T0 + 5000), "the quick brown fox"))
      query.processAllAvailable()
      assert(rows().length === 2)

      // batch 3: advance event time 10 min → watermark (max − 1 min)
      // passes T0 + horizon, evicting batch-1 digests
      input.addData((new Timestamp(T0 + 600000), "watermark mover"))
      query.processAllAvailable()

      // batch 4: the text repeats AFTER the horizon → re-admitted
      input.addData((new Timestamp(T0 + 601000), "the quick brown fox"))
      query.processAllAvailable()
      assert(rows().count(_ == "the quick brown fox") === 2,
             "out-of-horizon repeat must be re-admitted")
    } finally query.stop()
  }
}
