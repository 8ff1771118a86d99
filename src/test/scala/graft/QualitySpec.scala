package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quality

/** [[graft.ops.Quality]] beyond the oracle (which only sees the clean
  * corpus, where every check passes): planted violations are counted
  * exactly, the observe() twin delivers metrics without an extra scan,
  * and the approximate frequent-items sketch keeps its superset
  * guarantee against the exact heavy-hitter query. */
class QualitySpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("planted violations are counted exactly, per check") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dq").toString
    // lineitem: one null key, one zero qty, one negative price (the
    // null-key row also has valid qty/price so counts stay independent)
    Seq[(Option[Long], Double, Double)](
      (Some(1L), 5.0, 100.0), (None, 1.0, 1.0), (Some(2L), 0.0, 50.0),
      (Some(3L), 2.0, -7.0), (Some(99L), 1.0, 1.0)) // 99 is an orphan
      .toDF("l_orderkey", "l_quantity", "l_extendedprice")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    // orders: id 2 duplicated, one null custkey
    Seq[(Long, Option[Long])]((1L, Some(10L)), (2L, Some(11L)),
                              (2L, Some(12L)), (3L, None))
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val got = Quality.dqChecks(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got("lineitem_null_orderkey") === ((1L, 0)))
    assert(got("lineitem_nonpositive_qty") === ((1L, 0)))
    assert(got("lineitem_negative_price") === ((1L, 0)))
    assert(got("lineitem_orphan_orderkey") === ((2L, 0))) // null key + 99
    assert(got("orders_dup_orderkey") === ((1L, 0)))
    assert(got("orders_null_custkey") === ((1L, 0)))
    assert(got.size === 6)
  }

  test("the clean gate corpus passes every check") {
    val rows = Quality.dqChecks(spark, sfDir).collect()
    assert(rows.length === 6)
    assert(rows.forall(r => r.getLong(1) === 0L && r.getInt(2) === 1))
  }

  test("dq_checks: all checks ride one scan per table, plus the anti-join") {
    val plan = Quality.dqChecks(spark, sfDir)
      .queryExecution.executedPlan.toString
    // 3 lineitem checks + 2 orders checks + referential = 2 table aggs
    // and 1 anti-join → at most 4 file scans, never one per check
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 4, s"expected <=4 scans for 6 checks, got $scans:\n$plan")
  }

  test("coverage gaps: planted missing slots are found exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cov").toString
    def t(day: Int) = java.sql.Timestamp.valueOf(s"2026-01-0$day 12:00:00")
    // 3-day spine (days 1..3), types a/b, cohorts 0/1: day 2 has no
    // events at all (4 gaps); day 3 misses (b, cohort 1) → 5 gaps total
    val rows = Seq(
      (1L, t(1), 0L, "a"), (2L, t(1), 1L, "a"),
      (3L, t(1), 0L, "b"), (4L, t(1), 1L, "b"),
      (5L, t(3), 0L, "a"), (6L, t(3), 1L, "a"), (7L, t(3), 0L, "b"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val gaps = Quality.coverageGaps(spark, dir, cohorts = 2).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    assert(gaps.toSet === Set(
      ("2026-01-02", "a", 0L), ("2026-01-02", "a", 1L),
      ("2026-01-02", "b", 0L), ("2026-01-02", "b", 1L),
      ("2026-01-03", "b", 1L)))
  }

  test("observe() delivers the expectation metrics with no extra scan") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
    val observed = Quality.withObservation(li)
    // the action must run the dataset's OWN execution (collect does;
    // count() builds a derived agg plan whose metrics land elsewhere)
    val n = observed.collect().length.toLong
    val m = observed.queryExecution.observedMetrics("graft_dq")
    assert(m.getAs[Long]("rows") === n)
    assert(m.getAs[Long]("null_keys") === 0L)
    assert(m.getAs[Long]("nonpos_qty") === 0L)
  }

  test("freqItems sketch result is a superset of the exact heavy hitters") {
    val exact = ext.Text.vocabHeavyHitters(spark, sfDir, minShare = 0.01)
      .collect().map(_.getString(0)).toSet
    val sketch = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .stat.freqItems(Seq("word"), 0.01)
      .collect()(0).getSeq[String](0).toSet
    assert(exact.subsetOf(sketch),
           s"missing from sketch: ${exact -- sketch}")
  }
}
