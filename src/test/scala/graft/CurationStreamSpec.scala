package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.stream.CurationPipeline]]'s contract: one curation
  * kernel, two execution forms — the streaming transform is stateless
  * and bit-identical to the batch kernel on the same rows, and the
  * foreachBatch micro-pipeline lands exactly the batch kernel's
  * survivors in the band-partitioned layout. */
class CurationStreamSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // one Gopher-passing body (64 words, stops present), one failing stub
  private val passText =
    (Seq.fill(4)("the quick brown fox jumps over a lazy dog and runs " +
      "with great speed that day").mkString(" ")) + " w1"
  private val failText = "short failing stub w2"

  /** Enough docs that the classifier bands split the passing set: the
    * variant suffix varies the hash per doc. */
  private def docs: Seq[(Long, String)] =
    (0L until 64L).map { i =>
      (i, if (i % 2 == 0) passText.dropRight(2) + s"w$i"
          else failText.dropRight(2) + s"w$i")
    }

  test("stream transform ≡ batch kernel, and the plan is stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.stream.CurationPipeline
      .curated(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("graft_curated")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_curated").toString)
      .start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("graft_curated").collect()
        .map(_.toString).sorted.toSeq
      val batch = ext.Curation.curateStream(docs.toDF("doc_id", "text"))
        .collect().map(_.toString).sorted.toSeq
      assert(batch.nonEmpty, "kernel dropped everything — fixture broken")
      assert(streamed == batch, "stream and batch kernels diverged")
      val exec = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!exec.contains("StateStore"),
        s"curation must be stateless:\n$exec")
    } finally q.stop()
  }

  test("kernel gates on BOTH rules: gopher failures and drop-band docs go") {
    val out = ext.Curation.curateStream(docs.toDF("doc_id", "text"))
      .select(col("doc_id"), col("pass"), col("band")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // no failing-stub doc (odd ids) survives, no drop band survives
    assert(out.forall { case (id, p, b) => id % 2 == 0 && p == 1 && b != "drop" })
    // and the gate is not vacuous in either direction
    assert(out.nonEmpty, "every doc dropped")
    assert(out.length < docs.count(_._1 % 2 == 0),
      "no passing doc was drop-banded — variant hash not splitting bands")
  }

  test("full ingest composition in ONE stream: watermarked exact dedup " +
       "upstream of the stateless curation gate") {
    // the complete "clean the crawl as it lands" pipeline: in-horizon
    // duplicates die in the (bounded) dedup state, survivors flow
    // straight through the per-row gate — one streaming plan, exactly
    // one stateful operator
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val piped = graft.stream.CurationPipeline.curated(
      graft.stream.IngestDedup.exactWithinWatermark(
        input.toDF().toDF("doc_id", "ts", "text"), "ts", "10 seconds"))
    val q = piped.writeStream.format("memory").queryName("graft_ingest_cur")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ingest_cur").toString)
      .start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      // doc 0's text arrives THREE times in-horizon (ids 0, 100, 102);
      // the dedup state must fold them to one before the gate
      val dup = docs.head._2
      input.addData(
        docs.map { case (i, t) => (i, t0, t) } ++
          Seq((100L, t0, dup), (102L, t0, dup)): _*)
      q.processAllAvailable()
      val out = spark.table("graft_ingest_cur")
        .select(col("text")).collect().map(_.getString(0))
      // every surviving text is unique (the duplicate died in state)...
      assert(out.distinct.length == out.length, "a duplicate passed the gate")
      // ...and the survivors are exactly the batch kernel's on the
      // deduped set
      val expect = ext.Curation.curateStream(docs.toDF("doc_id", "text"))
        .select(col("text")).collect().map(_.getString(0)).sorted.toSeq
      assert(out.sorted.toSeq == expect, "composition diverged from kernel")
      // exactly ONE stateful operator — the watermarked dedup; the
      // curation gate adds none (no StateStoreSave/Restore beyond it)
      val exec = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(
        "StreamingDeduplicateWithinWatermark".r.findAllIn(exec).size == 1,
        s"expected exactly the dedup state node:\n${exec.take(800)}")
      assert(!exec.contains("StateStoreSave"),
        s"the stateless gate grew state:\n${exec.take(800)}")
    } finally q.stop()
  }

  test("foreachBatch micro-pipeline lands the kernel's survivors " +
       "band-partitioned") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cur_sink").toString
    val input = MemoryStream[(Long, String)]
    val q = graft.stream.CurationPipeline.curatedParquetSink(
        input.toDF().toDF("doc_id", "text"),
        s"$dir/out", s"$dir/ckpt").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(s"$dir/out")
    val expected = ext.Curation.curateStream(docs.toDF("doc_id", "text"))
      .select(col("doc_id"), col("band")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(landed.select(col("doc_id"), col("band")).collect()
             .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq == expected)
    // the band partitioning is physical: one directory per surviving band
    val bandDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("band=")).sorted
    assert(bandDirs.sameElements(
             expected.map(_._2).distinct.sorted.map(b => s"band=$b")),
           bandDirs.mkString(","))
  }
}
