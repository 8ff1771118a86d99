package graft.stream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.Sessions

/** Deploy-time composition of the reference's full Kafka topology
  * (README.md:49–105): one tick topic fans out to the candle processor
  * and raw-tick archival; the processor's candle topic fans out to candle
  * archival — four concurrent queries off two sources, exactly the
  * reference's wiring (data_processor.py:65–183, tick_to_hdfs.py:20–71,
  * candle_to_hdfs.py:38–63) with its checkpoint layout
  * (`<root>/checkpoints/{candles,ticks,candles_archive}`).
  *
  * This main needs the `spark-sql-kafka-0-10` connector jar and a broker,
  * neither of which exists in the zero-egress build sandbox — so it is
  * compile-verified here and runnable only at deploy
  * (`spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>`).
  * Every stage it composes IS executed elsewhere: the parse→classify→
  * candle chain by the correctness gate and StreamingSpec, the fan-out
  * pattern by FanOutSpec, the sinks by ArchivalSpec, and the option
  * wiring by KafkaWiringSpec.
  *
  * Args: bootstrap tickTopic candleTopic dataRoot
  * (defaults: localhost:9092 upstox_ticks upstox_orderflow /tmp/graft).
  */
object KafkaDemo {
  def main(args: Array[String]): Unit = {
    val bootstrap   = args.lift(0).getOrElse("localhost:9092")
    val tickTopic   = args.lift(1).getOrElse("upstox_ticks")
    val candleTopic = args.lift(2).getOrElse("upstox_orderflow")
    val root        = args.lift(3).getOrElse("/tmp/graft")

    val spark: SparkSession = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // Processor: tick topic (replayed from earliest) → candles → candle topic.
    val ticks = Sources.valueAsJson(
      Sources.kafka(spark, Sources.kafkaTickOptions(bootstrap, tickTopic)))
    val candles = CandlePipeline.candles(ticks)
    val processor = Sinks.kafkaSink(candles, bootstrap, candleTopic,
        checkpoint = s"$root/checkpoints/candles")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

    // Bronze archival: tick topic (tailing from latest) → date-partitioned parquet.
    val tickArchive = Sinks.partitionedParquetSink(
      ArchivalPipeline.tickArchival(Sources.valueAsJson(
        Sources.kafka(spark, Sources.kafkaArchivalOptions(bootstrap, tickTopic)))),
      dateFrom = "tick_time",
      path = s"$root/trading/ticks",
      checkpoint = s"$root/checkpoints/ticks").start()

    // Silver archival: candle topic → per-batch-sorted partitioned parquet.
    val candleArchive = Sinks.sortedParquetSink(
      ArchivalPipeline.candleArchival(Sources.valueAsJson(
        Sources.kafka(spark, Sources.kafkaArchivalOptions(bootstrap, candleTopic)))),
      dateFrom = "window_start", sortCol = "window_start",
      path = s"$root/trading/candles",
      checkpoint = s"$root/checkpoints/candles_archive").start()

    System.err.println(s"[kafka-demo] running: ${processor.id}, " +
      s"${tickArchive.id}, ${candleArchive.id}")
    spark.streams.awaitAnyTermination()
  }
}
