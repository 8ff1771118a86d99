package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Incremental
import graft.stream.StaticEnrich

/** Partial-aggregate merge and stream-static enrichment beyond their
  * oracles: the daily partials survive a parquet round trip (the real
  * incremental pipeline's shape — materialize per load, merge at
  * report time) and still merge losslessly; the stream-static join is
  * broadcast, stateless, and keeps unmatched stream rows. */
class IncrementalSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._
  private implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("incremental merge from materialized partials equals direct rollup") {
    val dir = Files.createTempDirectory("graft_incr").toString
    // materialize the daily partial table the way a per-load job would
    Incremental.dailyPartials(spark, sfDir)
      .write.mode("overwrite").parquet(s"$dir/daily")
    val merged = Incremental.mergeToMonthly(spark.read.parquet(s"$dir/daily"))
      .collect()
    val direct = Incremental.incrementalMonthly(spark, sfDir).collect()
    assert(merged.length === direct.length && merged.length > 0)
    merged.zip(direct).foreach { case (m, d) =>
      assert(m.getDate(0) === d.getDate(0))
      assert(m.getString(1) === d.getString(1))
      assert(m.getLong(2) === d.getLong(2))
      // decimal partials make the re-merge bit-identical, not just close
      assert(m.getDouble(3) === d.getDouble(3))
      assert(m.getDouble(4) === d.getDouble(4))
      assert(m.getDouble(5) === d.getDouble(5))
      assert(m.getDouble(6) === d.getDouble(6))
    }
  }

  test("stream-static enrich: broadcast, stateless, left-keeps unmatched") {
    val events = MemoryStream[(String, Long, Timestamp)]
    val dim = Seq(("click", "engagement"), ("purchase", "revenue"))
      .toDF("event_type", "category")
    val enriched = StaticEnrich.enrich(
      events.toDF().toDF("event_type", "event_id", "ts"), dim, "event_type")
    val query = enriched.writeStream
      .format("memory").queryName("graft_enrich").outputMode("append")
      .option("checkpointLocation",
              Files.createTempDirectory("graft_enrich").toString)
      .start()
    try {
      events.addData(("click", 1L, new Timestamp(0L)),
                     ("view", 2L, new Timestamp(1000L)))
      query.processAllAvailable()
      val rows = spark.table("graft_enrich").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("category"))
        .toMap
      assert(rows === Map(1L -> "engagement", 2L -> null))
      // second batch sees the join re-planned — still stateless
      events.addData(("purchase", 3L, new Timestamp(2000L)))
      query.processAllAvailable()
      assert(spark.table("graft_enrich").count() === 3)
      val exec = query.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(exec.contains("BroadcastHashJoin"), exec)
      assert(!exec.contains("StateStore"), s"stream-static must be stateless:\n$exec")
    } finally query.stop()
  }
}
