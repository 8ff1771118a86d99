package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.IntervalJoin

/** Stream-stream interval join semantics over MemoryStream: match window
  * inclusion/exclusion, key isolation, and the left-outer null emission
  * that only fires once the watermark proves no match can arrive. */
class IntervalJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val T0 = 1705309200000L // 2024-01-15 09:00:00 UTC
  private def ts(offsetSec: Long) = new Timestamp(T0 + offsetSec * 1000)

  private def run(joinType: String, name: String): Unit = {
    val trades = MemoryStream[(String, Long, Timestamp)]
    val quotes = MemoryStream[(String, Long, Timestamp)]
    val joined = IntervalJoin.quotesNearTrades(
      trades.toDF().toDF("instrument", "trade_id", "trade_ts"),
      quotes.toDF().toDF("instrument", "quote_id", "quote_ts"),
      maxLag = "10 minutes", watermark = "5 minutes", joinType = joinType)
    val query = joined.writeStream
      .format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
              Files.createTempDirectory(s"graft_ij_$name").toString)
      .start()
    try {
      // quote inside the 10m window, one outside, one on the wrong key
      quotes.addData(("I1", 100L, ts(300)),  // 09:05 — in [08:50+600s? no: 09:00..09:10]
                     ("I1", 101L, ts(-700)), // 08:48:20 — outside 10m lag
                     ("I2", 102L, ts(240)))  // wrong instrument
      trades.addData(("I1", 1L, ts(600)))    // trade at 09:10
      query.processAllAvailable()
      val matched = spark.table(name).where(col("trade_id") === 1L).collect()
      assert(matched.length === 1, matched.mkString(","))
      assert(matched(0).getAs[Long]("quote_id") === 100L)

      // a trade with NO quote in range: inner never emits it; left-outer
      // emits the null-padded row only after the quote-side watermark
      // passes trade_ts (no earlier — a match could still arrive)
      trades.addData(("I3", 2L, ts(660)))
      query.processAllAvailable()
      assert(spark.table(name).where(col("trade_id") === 2L).count() === 0)
      // advance both watermarks far past trade 2's match window
      quotes.addData(("I9", 900L, ts(3600)))
      trades.addData(("I9", 9L, ts(3600)))
      query.processAllAvailable()
      val unmatched = spark.table(name).where(col("trade_id") === 2L).collect()
      if (joinType == "inner")
        assert(unmatched.isEmpty, "inner join must not emit unmatched trades")
      else {
        assert(unmatched.length === 1, "left-outer must emit the trade once proven unmatched")
        assert(unmatched(0).isNullAt(unmatched(0).fieldIndex("quote_id")))
      }
    } finally query.stop()
  }

  test("inner interval join matches only in-window same-key quotes") {
    run("inner", "ij_inner")
  }

  test("left-outer interval join null-pads once the watermark proves no match") {
    run("leftOuter", "ij_outer")
  }
}
