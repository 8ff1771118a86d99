package graft

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.Candle
import graft.stream.RollingTail

/** Custom-state streaming semantics (flatMapGroupsWithState) that DuckDB
  * cannot oracle: the bounded rolling tail accumulates ACROSS
  * micro-batches per instrument, stays capped at MaxTail, and emits one
  * refreshed stat row per touched instrument per batch. */
class RollingTailSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val T0 = LocalDateTime.of(2024, 1, 15, 9, 0)

  private def candle(instr: String, minute: Int, close: Double): Candle =
    Candle(instr, T0.plusMinutes(minute.toLong), T0.plusMinutes(minute + 1L),
           close, close, close, close, 1, 0, 1, 1, 0.0, 0.0)

  test("tail state accumulates across batches per instrument and stays bounded") {
    val input = MemoryStream[Candle]
    val query = RollingTail.stats(input.toDS()).writeStream
      .format("memory").queryName("rolling_tail").outputMode("update")
      .option("checkpointLocation",
              Files.createTempDirectory("graft_tail_ckpt").toString)
      .start()
    try {
      // batch 1: out-of-order within the batch → folded by window_start
      input.addData(candle("A", 1, 10.0), candle("A", 0, 30.0), candle("B", 0, 5.0))
      query.processAllAvailable()
      val b1 = spark.table("rolling_tail").as[RollingTail.TailStats]
        .collect().map(s => s.instrument -> s).toMap
      assert(b1("A").n === 2)
      assert(b1("A").avg_close === 20.0)     // (30 + 10) / 2
      assert(b1("A").as_of === T0.plusMinutes(1)) // newest by window_start
      assert(b1("B").n === 1 && b1("B").min_close === 5.0)

      // batch 2: state carries over — A's tail is now 3 closes
      input.addData(candle("A", 2, 50.0))
      query.processAllAvailable()
      val b2 = spark.table("rolling_tail").as[RollingTail.TailStats].collect()
        .filter(_.instrument == "A").maxBy(_.n)
      assert(b2.n === 3)
      assert(b2.avg_close === 30.0)          // (30 + 10 + 50) / 3
      assert(b2.max_close === 50.0 && b2.min_close === 10.0)

      // batch 3: 150 more candles → tail must cap at MaxTail, evicting
      // the oldest (closes 30, 10, 50 all fall out; survivors are the
      // last 100 of 1000+i)
      input.addData((0 until 150).map(i => candle("A", 3 + i, 1000.0 + i)): _*)
      query.processAllAvailable()
      val b3 = spark.table("rolling_tail").as[RollingTail.TailStats].collect()
        .filter(_.instrument == "A").maxBy(_.as_of.toString)
      assert(b3.n === RollingTail.MaxTail)
      assert(b3.min_close === 1050.0)        // 150 - 100 = oldest survivor
      assert(b3.max_close === 1149.0)
    } finally query.stop()
  }

  test("window_start ties fold in arrival order; custom maxTail bounds the state") {
    val input = MemoryStream[Candle]
    val query = RollingTail.stats(input.toDS(), maxTail = 3).writeStream
      .format("memory").queryName("rolling_tail_ties").outputMode("update")
      .option("checkpointLocation",
              Files.createTempDirectory("graft_tail_ties_ckpt").toString)
      .start()
    try {
      // five candles in ONE batch, ALL the same window_start: the bounded
      // heap must keep the LAST 3 by arrival (the stable-sort contract),
      // not an arbitrary 3
      input.addData((1 to 5).map(i => candle("T", 0, i.toDouble)): _*)
      query.processAllAvailable()
      val s = spark.table("rolling_tail_ties").as[RollingTail.TailStats]
        .collect().filter(_.instrument == "T").head
      assert(s.n === 3)
      assert(s.min_close === 3.0 && s.max_close === 5.0) // arrivals 3,4,5 survive
      assert(s.avg_close === 4.0)
      assert(s.as_of === T0)
    } finally query.stop()
  }

  test("tail state survives a checkpointed restart") {
    val input = MemoryStream[Candle]
    val ckpt = Files.createTempDirectory("graft_tail_recover_ckpt").toString
    // the memory sink cannot recover from a checkpoint; foreachBatch can
    val results = new java.util.concurrent.ConcurrentLinkedQueue[RollingTail.TailStats]()
    def start() = RollingTail.stats(input.toDS()).writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[RollingTail.TailStats], _: Long) =>
        batch.collect().foreach(results.add)
      }
      .start()

    val q1 = start()
    try {
      input.addData(candle("R", 0, 10.0), candle("R", 1, 20.0))
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start() // same checkpoint → state store restores
    try {
      input.addData(candle("R", 2, 60.0))
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val s = results.asScala.filter(_.instrument == "R").maxBy(_.n)
      assert(s.n === 3, "restored state must include pre-restart closes")
      assert(s.avg_close === 30.0) // (10 + 20 + 60) / 3
      assert(s.min_close === 10.0 && s.max_close === 60.0)
    } finally q2.stop()
  }
}
