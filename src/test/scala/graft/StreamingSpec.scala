package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.{CandlePipeline, Sinks, Sources}

/** Streaming semantics over MemoryStream — the layer DuckDB cannot
  * oracle (SURVEY §5.4): watermark-gated append emission, late-data
  * drop, the foreachBatch fix for the reference's invalid streaming
  * sort, and the Kafka option asymmetry. */
class StreamingSpec extends AnyFunSuite {
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

  test("candles finalize only after the watermark passes the window; late ticks are dropped") {
    val input = MemoryStream[String]
    val candles = CandlePipeline.candles(
      input.toDF().select(col("value").as("json_str")),
      windowDur = "1 minute", watermark = "5 minutes")
    val query = candles.writeStream
      .format("memory").queryName("candles_wm")
      .outputMode("append")
      .option("checkpointLocation",
              Files.createTempDirectory("graft_wm_ckpt").toString)
      .start()
    try {
      // two ticks inside [09:00, 09:01): closer-to-ask buy of 5, then a sell of 3
      input.addData(
        tickJson("I1", T0 + 10000, 100.9, 5, 99.0, 101.0),
        tickJson("I1", T0 + 20000, 99.1, 3, 99.0, 101.0))
      query.processAllAvailable()
      assert(spark.table("candles_wm").count() === 0,
             "candle emitted before watermark passed its window end")

      // advance event time to 09:07 → watermark 09:02 > window end 09:01
      input.addData(tickJson("I1", T0 + 420000, 50.0, 1, 49.0, 51.0))
      query.processAllAvailable()
      val rows = spark.table("candles_wm").collect()
      assert(rows.length === 1)
      val r = rows(0)
      assert(r.getAs[String]("instrument") === "I1")
      assert(r.getAs[Double]("open") === 100.9)   // earlier ltt
      assert(r.getAs[Double]("close") === 99.1)   // later ltt
      assert(r.getAs[Double]("high") === 100.9)
      assert(r.getAs[Double]("low") === 99.1)
      assert(r.getAs[Long]("buy_volume") === 5)   // tick 1 closer to ask
      assert(r.getAs[Long]("sell_volume") === 3)  // tick 2 closer to bid
      assert(r.getAs[Long]("delta") === 2)

      // a tick for the already-finalized 09:00 window is behind the
      // watermark → dropped, no duplicate/updated candle
      input.addData(tickJson("I1", T0 + 30000, 1000.0, 99, 999.0, 1001.0))
      query.processAllAvailable()
      val after = spark.table("candles_wm").collect()
      assert(after.length === 1)
      assert(after(0).getAs[Double]("high") === 100.9,
             "late tick mutated a finalized candle")
    } finally query.stop()
  }

  test("sortedParquetSink (F1 fix) writes date-partitioned parquet per batch") {
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("window_start", "close")
    val out  = Files.createTempDirectory("graft_sorted_out").toString
    val ckpt = Files.createTempDirectory("graft_sorted_ckpt").toString
    val query = Sinks.sortedParquetSink(df, dateFrom = "window_start",
        sortCol = "window_start", path = out, checkpoint = ckpt).start()
    try {
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-15 09:03:00"), 101.0),
        (java.sql.Timestamp.valueOf("2024-01-15 09:01:00"), 100.0),
        (java.sql.Timestamp.valueOf("2024-01-16 09:00:00"), 102.0))
      query.processAllAvailable()
    } finally query.stop()
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("date="))
    assert(dirs.toSet === Set("date=2024-01-15", "date=2024-01-16"))
    val back = spark.read.parquet(out)
    assert(back.count() === 3)
    assert(back.agg(sum(col("close"))).collect()(0).getDouble(0) === 303.0)
  }

  test("streaming candle state handles 1000 instruments in one query") {
    // the per-(window, instrument) state regime real instrument-keyed
    // data has — not the 1-3 instruments of the semantic tests
    val input = MemoryStream[String]
    val candles = CandlePipeline.candles(
      input.toDF().select(col("value").as("json_str")))
    val query = candles.writeStream
      .format("memory").queryName("candles_hc").outputMode("append")
      .option("checkpointLocation",
              Files.createTempDirectory("graft_hc_ckpt").toString)
      .start()
    try {
      val ticks = (0 until 1000).flatMap { i =>
        Seq(tickJson(s"I$i", T0 + 1000 + i, 100.0 + i, 2, 99.0, 101.0),
            tickJson(s"I$i", T0 + 30000 + i, 200.0 + i, 3, 199.0, 201.0))
      }
      input.addData(ticks: _*)
      input.addData(tickJson("MOVER", T0 + 420000, 1.0, 1, 0.9, 1.1))
      query.processAllAvailable()
      val rows = spark.table("candles_hc").collect()
      assert(rows.length === 1000, s"expected one candle per instrument")
      val i7 = rows.find(_.getAs[String]("instrument") == "I7").get
      assert(i7.getAs[Double]("open") === 107.0)
      assert(i7.getAs[Double]("close") === 207.0)
      assert(i7.getAs[Long]("total_volume") === 5)
    } finally query.stop()
  }

  test("console sink (B4) starts and drains a micro-batch") {
    val input = MemoryStream[String]
    val query = Sinks.consoleSink(
        input.toDF().select(col("value").as("json_str")), numRows = 5)
      .option("checkpointLocation",
              Files.createTempDirectory("graft_console_ckpt").toString)
      .start()
    try {
      input.addData(tickJson("C1", T0, 1.0, 1, 0.9, 1.1))
      query.processAllAvailable()
      assert(query.isActive)
      assert(query.lastProgress.numInputRows === 1)
    } finally query.stop()
  }

  test("kafka source options preserve the reference's offset asymmetry") {
    val tick = Sources.kafkaTickOptions("broker:9092", "upstox_ticks")
    val arch = Sources.kafkaArchivalOptions("broker:9092", "upstox_ticks")
    assert(tick("startingOffsets") === "earliest") // processor replays
    assert(arch("startingOffsets") === "latest")   // archival tails
    assert(tick("subscribe") === "upstox_ticks")
  }

  test("typed Dataset[Candle] boundary round-trips the candle schema") {
    val input = MemoryStream[String]
    val typed = CandlePipeline.candlesTyped(
      input.toDF().select(col("value").as("json_str")))
    val query = typed.writeStream
      .format("memory").queryName("candles_typed")
      .outputMode("append")
      .option("checkpointLocation",
              Files.createTempDirectory("graft_typed_ckpt").toString)
      .start()
    try {
      input.addData(tickJson("T1", T0 + 1000, 10.0, 2, 9.0, 11.0))
      input.addData(tickJson("T1", T0 + 420000, 50.0, 1, 49.0, 51.0))
      query.processAllAvailable()
      val cs = spark.table("candles_typed").as[graft.schema.Candle].collect()
      assert(cs.length === 1)
      assert(cs(0).instrument === "T1")
      assert(cs(0).open === 10.0 && cs(0).total_volume === 2)
      assert(cs(0).window_start.toString === "2024-01-15T09:00")
    } finally query.stop()
  }

  test("rate-source tick generator produces parseable wire JSON") {
    // rateTicks is a stream; validate the same generator columns in batch
    val df = CandlePipeline.parseAndClassify(
      graft.sources.TickGen
        .ticksFromEvents(Tables.events(spark, TestSpark.sfDir))
        .select(col("json_str")))
    assert(df.filter(col("ltp").isNull).count() === 0)
    assert(df.count() > 0)
  }
}
