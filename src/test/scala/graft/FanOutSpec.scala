package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.{ArchivalPipeline, CandlePipeline, Sinks}

/** §2.H multi-query fan-out: the reference runs its queries CONCURRENTLY
  * in one session — the tick topic feeds the candle processor AND raw
  * archival, the candle topic feeds candle archival
  * (data_processor.py:74–183, tick_to_hdfs.py, candle_to_hdfs.py). This
  * spec reproduces that topology with MemoryStream standing in for the
  * two topics: three queries started together in one SparkSession, each
  * maintaining its own offsets/checkpoint, each output independently
  * correct. */
class FanOutSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tickJson(instr: String, lttMs: Long, ltp: Double, ltq: Int,
                       bid: Double, ask: Double): String =
    s"""{"type":"live_feed","feeds":{"$instr":{"fullFeed":{"marketFF":""" +
      s"""{"ltpc":{"ltp":$ltp,"ltt":"$lttMs","ltq":"$ltq","cp":0.0},""" +
      s""""marketLevel":{"bidAskQuote":[{"bidQ":"1","bidP":$bid,"askQ":"1","askP":$ask}]},""" +
      s""""atp":0.0,"vtt":"0","tbq":1.0,"tsq":2.0},"requestMode":"full_d30"}}},""" +
      s""""currentTs":"$lttMs"}"""

  private val T0 = 1705309200000L // 2024-01-15 09:00:00 UTC

  test("three concurrent queries off two streams: candles + tick archival + candle archival") {
    val tickTopic   = MemoryStream[String] // stands in for upstox_ticks
    val candleTopic = MemoryStream[String] // stands in for upstox_orderflow
    val tickDf   = tickTopic.toDF().select(col("value").as("json_str"))
    val candleDf = candleTopic.toDF().select(col("value").as("json_str"))

    val ticksOut   = Files.createTempDirectory("graft_fan_ticks").toString
    val candlesOut = Files.createTempDirectory("graft_fan_candles").toString

    // Query 1: processor — watermarked candles to a memory table.
    val qCandles = CandlePipeline.candles(tickDf).writeStream
      .format("memory").queryName("fanout_candles").outputMode("append")
      .option("checkpointLocation",
              Files.createTempDirectory("graft_fan_ck1").toString)
      .start()
    // Query 2: bronze — same tick stream, independent offsets/checkpoint.
    val qTickArch = Sinks.partitionedParquetSink(
      ArchivalPipeline.tickArchival(tickDf), dateFrom = "tick_time",
      path = ticksOut,
      checkpoint = Files.createTempDirectory("graft_fan_ck2").toString,
      trigger = Trigger.ProcessingTime(0)).start()
    // Query 3: silver — the candle stream.
    val qCandleArch = Sinks.sortedParquetSink(
      ArchivalPipeline.candleArchival(candleDf),
      dateFrom = "window_start", sortCol = "window_start",
      path = candlesOut,
      checkpoint = Files.createTempDirectory("graft_fan_ck3").toString).start()

    try {
      assert(spark.streams.active.count(q =>
        Set(qCandles.id, qTickArch.id, qCandleArch.id).contains(q.id)) === 3,
        "all three queries must run concurrently in one session")

      // buy of 5 then sell of 3 in [09:00,09:01), then an event-time
      // advance to 09:07 so the watermark finalizes the window.
      tickTopic.addData(
        tickJson("I1", T0 + 10000, 100.9, 5, 99.0, 101.0),
        tickJson("I1", T0 + 20000, 99.1, 3, 99.0, 101.0))
      tickTopic.addData(tickJson("I1", T0 + 420000, 50.0, 1, 49.0, 51.0))
      candleTopic.addData(
        """{"instrument":"I1","window_start":"2024-01-15T09:00:00","window_end":"2024-01-15T09:01:00",""" +
          """"open":1.0,"high":2.0,"low":0.5,"close":1.5,"buy_volume":3,"sell_volume":1,""" +
          """"total_volume":4,"delta":2,"tbq":1.0,"tsq":2.0}""")
      qCandles.processAllAvailable()
      qTickArch.processAllAvailable()
      qCandleArch.processAllAvailable()

      // Query 1: the finalized candle is correct.
      val cs = spark.table("fanout_candles").collect()
      assert(cs.length === 1)
      assert(cs(0).getAs[Double]("open") === 100.9)
      assert(cs(0).getAs[Long]("buy_volume") === 5)
      assert(cs(0).getAs[Long]("sell_volume") === 3)

      // Query 2: ALL THREE ticks archived (archival is stateless — the
      // 09:07 watermark-advancing tick is archived like any other).
      val ticksBack = spark.read.parquet(ticksOut)
      assert(ticksBack.count() === 3)
      assert(ticksBack.select("instrument").as[String].collect().toSet === Set("I1"))

      // Query 3: the candle-topic record landed typed and partitioned.
      val candlesBack = spark.read.parquet(candlesOut)
      assert(candlesBack.count() === 1)
      assert(candlesBack.collect()(0).getAs[Double]("close") === 1.5)
    } finally {
      qCandles.stop(); qTickArch.stop(); qCandleArch.stop()
    }
  }
}
