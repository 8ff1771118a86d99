package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the deliberately-preserved reference semantics that the DuckDB
  * gate exercises only incidentally: the empty-array sentinel leak
  * (data_processor.py:128-134), the C10-millisecond vs C11-second epoch
  * conversion split (data_processor.py:113-114 vs tick_to_hdfs.py:50),
  * tumbling-window epoch alignment, and the orderKey fail-fast guard. */
class SemanticsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val DblMax = 1.7976931348623157e308

  test("fold over EMPTY array leaks the ±DblMax sentinel (bug-compatible op)") {
    val df = Seq(Seq.empty[Double], Seq(10.0, 20.0)).toDF("prices")
      .select(
        aggregate(col("prices"), lit(-DblMax),
                  (acc, x) => when(acc > x, acc).otherwise(x)).as("best_sentinel"),
        array_max(col("prices")).as("best_guarded"))
      .collect()
    assert(df(0).getDouble(0) === -DblMax) // sentinel leaks through
    assert(df(0).isNullAt(1))              // guarded variant → NULL
    assert(df(1).getDouble(0) === 20.0)
    assert(df(1).getDouble(1) === 20.0)
  }

  test("C10 keeps millisecond precision; C11 truncates to whole seconds") {
    val ms = 1705312245678L // ...45.678s
    val row = Seq(ms).toDF("ltt_ms")
      .select(
        timestamp_millis(col("ltt_ms")).cast(TimestampType).as("c10"),
        timestamp_seconds((col("ltt_ms").cast(DoubleType) / 1000).cast(LongType))
          .cast(TimestampType).as("c11"))
      .collect()(0)
    assert(row.getTimestamp(0).getTime === ms)
    assert(row.getTimestamp(1).getTime === (ms / 1000) * 1000)
  }

  test("1-minute tumbling windows are epoch-aligned; boundary row goes to the next window") {
    val rows = Seq(
      Timestamp.valueOf("2024-01-15 00:00:59.999"),
      Timestamp.valueOf("2024-01-15 00:01:00.0")
    ).toDF("ts")
      .groupBy(window(col("ts"), "1 minute")).count()
      .select(col("window.start").cast(StringType).as("start")).orderBy(col("start"))
      .as[String].collect()
    assert(rows === Array("2024-01-15 00:00:00", "2024-01-15 00:01:00"))
  }

  test("orderKey fails fast when the tiebreaker id exceeds the reserved range") {
    val ok = Seq((Timestamp.valueOf("2024-01-15 00:00:00"), 999999L))
      .toDF("ts", "id")
      .select(ops.Candles.orderKey(col("ts"), col("id")).as("k"))
    assert(ok.collect()(0).getLong(0) % 1000000L === 999999L)

    val bad = Seq((Timestamp.valueOf("2024-01-15 00:00:00"), 1000000L))
      .toDF("ts", "id")
      .select(ops.Candles.orderKey(col("ts"), col("id")).as("k"))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("orderKey tiebreaker id out of"))
  }

  test("orderKey makes open/close independent of row order when timestamps collide") {
    val t = Timestamp.valueOf("2024-01-15 00:00:30")
    val rows = Seq((t, 0L, 5.0), (t, 1L, 9.0), (t, 2L, 7.0))
    Seq(rows, rows.reverse).foreach { rs =>
      val got = rs.toDF("ts", "id", "v")
        .repartition(2)
        .agg(min_by(col("v"), ops.Candles.orderKey(col("ts"), col("id"))).as("open"),
             max_by(col("v"), ops.Candles.orderKey(col("ts"), col("id"))).as("close"))
        .collect()(0)
      assert((got.getDouble(0), got.getDouble(1)) === ((5.0, 7.0)))
    }
  }
}
