package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.Sessions

/** Runnable end-to-end demo — no broker required: the rate-source tick
  * generator (A5 stand-in) feeds the real candle pipeline and the bronze
  * archival branch concurrently, exactly the reference's fan-out shape
  * with the wire format intact (JSON ticks in, OHLC candles out).
  *
  *   sbt "runMain graft.stream.LocalDemo [seconds] [ticksPerSec]"
  *
  * Windows are shortened (5 s window, 2 s watermark) so candles finalize
  * within the demo's runtime; production values are the reference's
  * 1 minute / 5 minutes (CandlePipeline defaults). Prints emitted
  * candles live, then a summary of what both branches produced.
  */
object LocalDemo {
  def main(args: Array[String]): Unit = {
    val seconds     = args.lift(0).map(_.toInt).getOrElse(20)
    val ticksPerSec = args.lift(1).map(_.toInt).getOrElse(500)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    import spark.implicits._

    val bronzeOut = Files.createTempDirectory("graft_demo_bronze").toString

    val ticks = Sources.rateTicks(spark, rowsPerSecond = ticksPerSec)

    val candleQuery = Sinks.consoleSink(
        CandlePipeline.candles(ticks, windowDur = "5 seconds", watermark = "2 seconds"),
        numRows = 10)
      .option("checkpointLocation",
              Files.createTempDirectory("graft_demo_ck1").toString)
      .start()

    val archiveQuery = Sinks.partitionedParquetSink(
        ArchivalPipeline.tickArchival(ticks),
        dateFrom = "tick_time", path = bronzeOut,
        checkpoint = Files.createTempDirectory("graft_demo_ck2").toString,
        trigger = Trigger.ProcessingTime("2 seconds"))
      .start()

    println(s"[demo] running ${seconds}s at $ticksPerSec ticks/s " +
      s"(${spark.streams.active.length} concurrent queries)...")
    Thread.sleep(seconds * 1000L)
    candleQuery.stop(); archiveQuery.stop()

    val archived = spark.read.parquet(bronzeOut)
    val nTicks = archived.count()
    val instruments = archived.select("instrument").distinct().as[String].count()
    println(f"[demo] bronze archived $nTicks%d ticks across $instruments%d " +
      f"instruments at $bronzeOut")
    println("[demo] candle emission shown above (console sink); " +
      "same pipeline, reference windows: CandlePipeline.candles(ticks)")
    spark.stop()
  }
}
