package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming sinks — B1-B4 of SURVEY.md §2, including the foreachBatch
  * fix for the reference's invalid streaming global sort (F1).
  *
  * All writers are returned un-started so callers own the query
  * lifecycle (`.start()` / `awaitTermination`), mirroring how the
  * reference composes its six concurrent queries
  * (data_processor.py:74-183).
  */
object Sinks {

  /** B1: whole-row JSON → Kafka topic, append mode
    * (reference: data_processor.py:175-183). to_json(struct(*)) is C17. */
  def kafkaSink(df: DataFrame, bootstrap: String, topic: String,
                checkpoint: String): DataStreamWriter[Row] =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** B2/B3: date-partitioned Parquet archival with a 10 s processing-time
    * trigger (reference: tick_to_hdfs.py:62-71, candle_to_hdfs.py:56-63).
    * `dateFrom` names the timestamp column the partition date derives
    * from. Exactly-once via the FileStreamSink _spark_metadata log. */
  def partitionedParquetSink(df: DataFrame, dateFrom: String, path: String,
                             checkpoint: String,
                             trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : DataStreamWriter[Row] =
    df.withColumn("date", to_date(col(dateFrom)))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("date")
      .outputMode("append")
      .trigger(trigger)

  /** F1 FIX: the reference calls orderBy on a streaming DataFrame before
    * its Parquet sink (candle_to_hdfs.py:53), which Spark's
    * UnsupportedOperationChecker rejects at start(); the comment above it
    * admits the intent is per-batch ordering. This sink implements that
    * intent legally: foreachBatch gives a BATCH frame per micro-batch,
    * where sortWithinPartitions is valid — and cheaper than a global
    * sort, which a downstream reader of date-partitioned data could not
    * rely on anyway. */
  def sortedParquetSink(df: DataFrame, dateFrom: String, sortCol: String,
                        path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .withColumn("date", to_date(col(dateFrom)))
          .sortWithinPartitions(col(sortCol))
          .write.mode("append").partitionBy("date").parquet(path)
      }

  /** B4: console observability sink (reference: the five debug sinks,
    * data_processor.py:74-99,118-123,168-173). */
  def consoleSink(df: DataFrame, numRows: Int = 20): DataStreamWriter[Row] =
    df.writeStream.format("console")
      .option("numRows", numRows.toLong)
      .option("truncate", false)
      .outputMode("append")
}
