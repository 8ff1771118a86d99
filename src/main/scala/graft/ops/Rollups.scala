package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** The dashboard's gold layer as first-class engine queries — E10-E12 and
  * F1-F3 of SURVEY.md §2 (reference: data_plotter.py:159-197,274-295,
  * deque(maxlen=100) at :15; candle_to_hdfs.py:53).
  *
  * Scale posture: every "tail" here is a top-k by recency —
  * `ORDER BY ... DESC LIMIT k` plans as TakeOrderedAndProject (per-
  * partition heap + single k-row merge at the driver), NOT a global sort;
  * it is safe at any input size.
  */
object Rollups {

  private def k = get_json_object(col("props"), "$.k").cast(IntegerType)

  /** Last-100 rows by event time (F2 bounded tail), aggregated to the
    * dashboard's rolling stats (E10): max high / min low / volume sums /
    * 0-guarded buy:sell ratio (reference: data_plotter.py:276-282). */
  def tail100Stats(spark: SparkSession, dir: String): DataFrame = {
    val tail = Tables.events(spark, dir)
      .orderBy(col("ts").desc, col("event_id").desc).limit(100)
    val buy  = when((k % lit(2)) === 0, k).otherwise(lit(0))
    val sell = when((k % lit(2)) =!= 0, k).otherwise(lit(0))
    tail
      .select(col("event_id"), col("value"), buy.as("buy_v"), sell.as("sell_v"))
      .agg(
        max(col("value")).as("period_high"),
        min(col("value")).as("period_low"),
        sum(col("buy_v")).as("total_buy"),
        sum(col("sell_v")).as("total_sell"),
        (sum(col("buy_v")) - sum(col("sell_v"))).as("cum_delta"),
        // 0-guarded ratio: the reference only guards this client-side
        when(sum(col("sell_v")) =!= 0,
             sum(col("buy_v")).cast(DoubleType) / sum(col("sell_v")))
          .otherwise(lit(null)).as("buy_sell_ratio"),
        count(lit(1)).as("n"))
  }

  /** E11: per-candle dominance/sign classification
    * (reference: data_plotter.py:159-163,178). */
  def dominance(spark: SparkSession, dir: String): DataFrame = {
    // k is referenced 4× below — materialize the JSON path lookup once
    // per row (CollapseProject keeps multi-referenced non-cheap aliases)
    val kk   = col("kk")
    val buy  = when((kk % lit(2)) === 0, kk).otherwise(lit(0))
    val sell = when((kk % lit(2)) =!= 0, kk).otherwise(lit(0))
    Tables.events(spark, dir)
      .withColumn("kk", k)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(sum(buy).as("buy_volume"), sum(sell).as("sell_volume"))
      .select(
        col("window.start").as("window_start"), col("event_type"),
        col("buy_volume"), col("sell_volume"),
        when(col("buy_volume") > col("sell_volume"), lit("green"))
          .otherwise(lit("red")).as("candle_color"),
        when(col("buy_volume") - col("sell_volume") >= 0, lit("green"))
          .otherwise(lit("red")).as("delta_color"))
      .presentSorted(col("window_start"), col("event_type"))
  }

  /** E12: session price change per series — last close minus first open
    * with a 0-guarded percent change (reference: data_plotter.py:194-197). */
  def sessionChange(spark: SparkSession, dir: String): DataFrame = {
    val ord = Candles.orderKey(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(min_by(col("value"), ord).as("open"),
           max_by(col("value"), ord).as("close"))
      .select(
        col("event_type"), col("open"), col("close"),
        (col("close") - col("open")).as("change"),
        when(col("open") =!= 0.0,
             (col("close") - col("open")) / col("open") * 100)
          .otherwise(lit(null)).as("pct_change"))
      .presentSorted(col("event_type"))
  }

  /** F1: global ascending sort by event time (the reference's intent at
    * candle_to_hdfs.py:53 — invalid on a stream, a plain range-partitioned
    * Sort in batch; the streaming fix is stream/Sinks.sortedParquetSink). */
  def orderbyAsc(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("value"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .limit(500)

  /** F2: bounded tail — most recent 100 rows, newest first
    * (reference: deque(maxlen=100), data_plotter.py:15). */
  def topkRecent(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(100)

  /** F3: head sampling (reference: README.md:387,391 show(5)) — made
    * deterministic with an explicit key order. */
  def headSample(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id")).limit(5)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tail_100_stats" -> tail100Stats _,
    "dominance"      -> dominance _,
    "session_change" -> sessionChange _,
    "orderby_asc"    -> orderbyAsc _,
    "topk_recent"    -> topkRecent _,
    "head_sample"    -> headSample _)

  private val buySellBase =
    """(SELECT *, CAST(props->>'$.k' AS INTEGER) AS kk,
      |  CASE WHEN CAST(props->>'$.k' AS INTEGER) % 2 = 0
      |       THEN CAST(props->>'$.k' AS INTEGER) ELSE 0 END AS buy_v,
      |  CASE WHEN CAST(props->>'$.k' AS INTEGER) % 2 <> 0
      |       THEN CAST(props->>'$.k' AS INTEGER) ELSE 0 END AS sell_v
      |FROM events) e""".stripMargin

  val oracles: Map[String, String] = Map(
    "tail_100_stats" ->
      s"""SELECT max(value) AS period_high, min(value) AS period_low,
         |  CAST(sum(buy_v) AS BIGINT) AS total_buy,
         |  CAST(sum(sell_v) AS BIGINT) AS total_sell,
         |  CAST(sum(buy_v) - sum(sell_v) AS BIGINT) AS cum_delta,
         |  CASE WHEN sum(sell_v) <> 0
         |       THEN CAST(sum(buy_v) AS DOUBLE) / CAST(sum(sell_v) AS BIGINT)
         |       ELSE NULL END AS buy_sell_ratio,
         |  count(*) AS n
         |FROM (SELECT * FROM $buySellBase
         |      ORDER BY ts DESC, event_id DESC LIMIT 100)""".stripMargin,
    "dominance" ->
      s"""SELECT time_bucket(INTERVAL 1 hour, CAST(ts AS TIMESTAMP)) AS window_start,
         |  event_type,
         |  CAST(sum(buy_v) AS BIGINT) AS buy_volume,
         |  CAST(sum(sell_v) AS BIGINT) AS sell_volume,
         |  CASE WHEN sum(buy_v) > sum(sell_v) THEN 'green' ELSE 'red' END AS candle_color,
         |  CASE WHEN sum(buy_v) - sum(sell_v) >= 0 THEN 'green' ELSE 'red' END AS delta_color
         |FROM $buySellBase
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "session_change" ->
      """WITH t AS (SELECT *, epoch_ms(CAST(ts AS TIMESTAMP)) * 1000000 + event_id AS ord
        |           FROM events)
        |SELECT event_type,
        |  arg_min(value, ord) AS open, arg_max(value, ord) AS close,
        |  arg_max(value, ord) - arg_min(value, ord) AS change,
        |  CASE WHEN arg_min(value, ord) <> 0
        |       THEN (arg_max(value, ord) - arg_min(value, ord)) / arg_min(value, ord) * 100
        |       ELSE NULL END AS pct_change
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,
    "orderby_asc" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |ORDER BY ts ASC, event_id ASC LIMIT 500""".stripMargin,
    "topk_recent" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
        |ORDER BY ts DESC, event_id DESC LIMIT 100""".stripMargin,
    "head_sample" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY event_id LIMIT 5""".stripMargin)
}
