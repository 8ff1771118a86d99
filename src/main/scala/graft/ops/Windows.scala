package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Analytic window functions — the engine-side form of the dashboard's
  * rolling-tail statistics (SURVEY §2.E10: the reference computes them
  * client-side over a deque, data_plotter.py:274-295; here they are
  * first-class distributed operators).
  *
  * Scale posture: one hash Exchange on the partition key, then a
  * per-partition sort — state is a single frame buffer per partition, no
  * driver involvement. The rolling sum/avg accumulate in DECIMAL so the
  * result does not depend on the engine's frame-update strategy
  * (incremental slide vs recompute differ in float rounding; DECIMAL is
  * exact under both).
  */
object Windows {

  /** Trailing 10-row rolling stats per series, event-time ordered with
    * the id tiebreak. */
  def rollingStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-9, 0)
    Tables.events(spark, dir)
      .select(
        col("event_id"), col("event_type"), col("value"),
        max(col("value")).over(w).as("rolling_max"),
        min(col("value")).over(w).as("rolling_min"),
        sum(col("value").cast(DecimalType(18, 2))).over(w)
          .cast(DoubleType).as("rolling_sum"),
        count(lit(1)).over(w).as("rolling_n"))
      .withColumn("rolling_avg", col("rolling_sum") / col("rolling_n"))
      .presentSorted(col("event_id"))
  }

  /** [[rollingStats]] over a HIGH-CARDINALITY series key.
    *
    * Every other per-series operator in the fixture is keyed on
    * `event_type` — 5 distinct values, so on a 32-core box (let alone a
    * 1000-executor cluster) the exchange leaves all but 5 partitions
    * empty and the window work serializes on 5 cores. Real corpora key
    * these ops on the instrument (thousands of series); this query runs
    * the same trailing frame on the composed (event_type × user_id) key —
    * ~750 series at sf0.01, ~7500 at sf0.1 — so the bench row and the
    * PlanSpec assertion actually exercise the partitioning regime the
    * engine claims. `concat` (not concat_ws) so a null component nulls
    * the key exactly like SQL `||`. */
  def rollingStatsHc(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("series_key"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-9, 0)
    Tables.events(spark, dir)
      .withColumn("series_key",
        concat(col("event_type"), lit("-"), col("user_id").cast(StringType)))
      .select(
        col("event_id"), col("series_key"), col("value"),
        max(col("value")).over(w).as("rolling_max"),
        sum(col("value").cast(DecimalType(18, 2))).over(w)
          .cast(DoubleType).as("rolling_sum"),
        count(lit(1)).over(w).as("rolling_n"))
      .presentSorted(col("event_id"))
  }

  /** Group-wise top-n: the 3 highest-value events per series via
    * row_number over a fully-deterministic order. */
  def topnPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"),
              row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 3)
      .presentSorted(col("event_type"), col("rnk"))
  }

  /** Per-series offset access — lag/lead returns, the first derived
    * series every market-data user computes (tick-to-tick delta; the
    * reference's client does this over its deque, data_plotter.py). One
    * key exchange + one in-partition sort serves BOTH offsets; the delta
    * is a plain double subtraction of two stored values — exact, no
    * accumulation-order dependence. */
  def lagReturns(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
              lag(col("value"), 1).over(w).as("prev_value"),
              lead(col("value"), 1).over(w).as("next_value"))
      .withColumn("delta_prev", col("value") - col("prev_value"))
      .presentSorted(col("event_id"))
  }

  /** Rank-family surface over one shared exchange: quartile bucketing
    * (ntile), dense/sparse ranks on the raw value (ties collapse —
    * deterministic without a tiebreak), and percent_rank. ntile NEEDS the
    * total order (its bucket boundaries depend on row position), so its
    * window carries the event_id tiebreak; the rank functions
    * deliberately run on the UNBROKEN value order to exercise tie
    * semantics. Both windows partition on the same key, so Catalyst
    * plans one Exchange and two in-partition sorts. */
  def ntileQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val total = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val byVal = Window.partitionBy(col("event_type")).orderBy(col("value"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
              ntile(4).over(total).as("quartile"),
              rank().over(byVal).as("rnk"),
              dense_rank().over(byVal).as("drnk"),
              percent_rank().over(byVal).as("prnk"))
      .presentSorted(col("event_id"))
  }

  /** TIME-range window frame — "everything in the trailing hour",
    * however many rows that is. The row-count frames above (E10) answer
    * "last 10 observations"; real monitoring wants wall-clock windows,
    * and on an irregular event stream the two differ everywhere. The
    * frame bound rides exact integer microseconds (`unix_micros`) so
    * both engines cut the frame at identical instants; count + DECIMAL
    * sum keep the output merge-order-proof. Same scale shape as every
    * window here: one key Exchange, one in-partition sort, running
    * frame. */
  def rolling1hRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000L, 0L)
    Tables.events(spark, dir)
      .withColumn("ts_us",
        unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)))
      .select(col("event_id"), col("event_type"), col("ts"),
              count(lit(1)).over(w).as("n_1h"),
              sum(col("value").cast(DecimalType(28, 6))).over(w)
                .cast(DoubleType).as("sum_1h"))
      .presentSorted(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rolling_stats"    -> rollingStats _,
    "rolling_stats_hc" -> rollingStatsHc _,
    "topn_per_group"   -> topnPerGroup _,
    "lag_returns"      -> lagReturns _,
    "ntile_quartiles"  -> ntileQuartiles _,
    "rolling_1h_range" -> rolling1hRange _)

  val oracles: Map[String, String] = Map(
    "rolling_stats" ->
      """SELECT event_id, event_type, value,
        |  max(value) OVER w AS rolling_max,
        |  min(value) OVER w AS rolling_min,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rolling_sum,
        |  count(*) OVER w AS rolling_n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / count(*) OVER w AS rolling_avg
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "rolling_stats_hc" ->
      """SELECT event_id,
        |  event_type || '-' || CAST(user_id AS VARCHAR) AS series_key, value,
        |  max(value) OVER w AS rolling_max,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rolling_sum,
        |  count(*) OVER w AS rolling_n
        |FROM events
        |WINDOW w AS (PARTITION BY event_type || '-' || CAST(user_id AS VARCHAR)
        |             ORDER BY ts, event_id
        |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "topn_per_group" ->
      """SELECT event_type, event_id, value, rnk FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id) AS rnk
        |  FROM events)
        |WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin,
    "lag_returns" ->
      """SELECT event_id, event_type, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  value - lag(value, 1) OVER w AS delta_prev
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "ntile_quartiles" ->
      """SELECT event_id, event_type, value,
        |  ntile(4) OVER (PARTITION BY event_type
        |                 ORDER BY value, event_id) AS quartile,
        |  rank() OVER wv AS rnk,
        |  dense_rank() OVER wv AS drnk,
        |  percent_rank() OVER wv AS prnk
        |FROM events
        |WINDOW wv AS (PARTITION BY event_type ORDER BY value)
        |ORDER BY event_id""".stripMargin,
    "rolling_1h_range" ->
      """SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY CAST(ts AS TIMESTAMP)
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
}
