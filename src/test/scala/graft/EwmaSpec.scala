package graft

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.Candle
import graft.stream.Ewma

/** [[Ewma]] semantics over MemoryStream on the RocksDB state store (the
  * provider transformWithState requires): recurrence correctness across
  * batches, per-key state isolation, and intra-batch event-time
  * ordering. */
class EwmaSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val T = LocalDateTime.of(2024, 1, 15, 9, 0)
  private def candle(instr: String, minute: Int, close: Double): Candle =
    Candle(instr, T.plusMinutes(minute), T.plusMinutes(minute + 1),
           close, close, close, close, 1, 1, 2, 0, 1.0, 2.0)

  test("EWMA recurrence holds across batches, keys isolated, batches sorted") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Candle]
    val query = Ewma.ewma(input.toDS(), alpha = 0.5).writeStream
      .format("memory").queryName("ewma_out").outputMode("update")
      .option("checkpointLocation",
              Files.createTempDirectory("graft_ewma").toString)
      .start()
    try {
      // batch 1: two instruments; I1 gets minutes 1 and 0 OUT OF ORDER —
      // the processor must fold minute 0 first
      input.addData(candle("I1", 1, 110.0), candle("I1", 0, 100.0),
                    candle("I2", 0, 50.0))
      query.processAllAvailable()
      // batch 2: the recurrence must continue from checkpointed state
      input.addData(candle("I1", 2, 120.0), candle("I2", 1, 60.0))
      query.processAllAvailable()

      val rows = spark.table("ewma_out")
        .collect()
        .map(r => (r.getString(0), r.getAs[LocalDateTime](1), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      // I1: seed 100 → 0.5·110 + 0.5·100 = 105 → 0.5·120 + 0.5·105 = 112.5
      // I2: seed 50 → 0.5·60 + 0.5·50 = 55
      val i1 = rows.filter(_._1 == "I1").map(_._3)
      val i2 = rows.filter(_._1 == "I2").map(_._3)
      assert(i1.toSeq === Seq(100.0, 105.0, 112.5), rows.mkString("\n"))
      assert(i2.toSeq === Seq(50.0, 55.0), rows.mkString("\n"))
    } finally {
      query.stop()
      old match {
        case Some(v) => spark.conf.set(provider, v)
        case None    => spark.conf.unset(provider)
      }
    }
  }
}
