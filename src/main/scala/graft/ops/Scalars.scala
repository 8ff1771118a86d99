package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Scalar/temporal expressions and filters — C9-C12, C17, D1, D2, A4 of
  * SURVEY.md §2. All per-row codegen'd expressions except `scan_pruned`,
  * which exists to keep the parquet-scan pushdown surface honest (its
  * filter and 3-column projection must reach the file source — see
  * PlanSpec's scan_pruned pin).
  */
object Scalars {

  private def k = get_json_object(col("props"), "$.k").cast(IntegerType)
  private def lttMs = unix_millis(col("ts").cast(TimestampType))

  /** C9: string→int cast, both directions (reference: data_processor.py:112). */
  def castStrInt(spark: SparkSession, dir: String): DataFrame =
    // the common subexpression is the parse+cast chain — materialize it
    // once per row instead of once per referencing column
    Tables.events(spark, dir)
      .withColumn("ltq_str", k.cast(StringType))
      .select(col("event_id"),
              col("ltq_str"),
              col("ltq_str").cast(IntegerType).as("ltq"),
              col("user_id").cast(StringType).as("user_str"))
      .presentSorted(col("event_id"))

  /** C10: epoch-ms → timestamp, MILLISECOND precision preserved
    * (reference: data_processor.py:113-114 — their float `/1000` path;
    * timestamp_millis is the exact-arithmetic form of the same
    * semantics). Contrast with C11 below. */
  def epochMsTs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), lttMs.as("ltt_ms"),
              timestamp_millis(lttMs).cast(TimestampNTZType).as("event_time"))
      .presentSorted(col("event_id"))

  /** C11: to_timestamp((ltt/1000) CAST LONG) — truncates to WHOLE SECONDS
    * (cast before to_timestamp), deliberately coarser than C10
    * (reference: tick_to_hdfs.py:50; semantic split per SURVEY §7.5.2). */
  def epochSecTs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
              timestamp_seconds((lttMs.cast(DoubleType) / 1000).cast(LongType))
                .cast(TimestampNTZType).as("tick_time"))
      .presentSorted(col("event_id"))

  /** C12: to_date for partition derivation (reference: tick_to_hdfs.py:51). */
  def toDateOp(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), to_date(col("ts")).as("date"))
      .presentSorted(col("event_id"))

  /** C17: to_json(struct(*)) whole-row serialization for the Kafka sink
    * path (reference: data_processor.py:175). Integer/string fields only —
    * double JSON rendering is engine-specific and would flake the oracle. */
  def toJsonRow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
              to_json(struct(col("event_id"), col("event_type"), col("user_id")))
                .as("value"))
      .presentSorted(col("event_id"))

  /** D1: IS NOT NULL conjunction filter (reference: data_processor.py:115).
    * Nulls are derived (k%7==0 → NULL) so the filter actually drops rows. */
  def notnullFilter(spark: SparkSession, dir: String): DataFrame = {
    val kk  = col("kk")
    val ltq = when((kk % lit(7)) === 0, lit(null)).otherwise(kk)
    val ltp = when((col("user_id") % lit(5)) === 0, lit(null))
      .otherwise(col("value"))
    Tables.events(spark, dir)
      .withColumn("kk", k) // parse once; ltq references it twice
      .select(col("event_id"), ltq.as("ltq"), ltp.as("ltp"), col("ts"))
      .filter(col("ltq").isNotNull && col("ltp").isNotNull && col("ts").isNotNull)
      .select("event_id", "ltq", "ltp")
      .presentSorted(col("event_id"))
  }

  /** D2: market-hours gate — 09:15-15:30 wall clock, Monday-Friday —
    * promoted into the engine as a plan-level predicate
    * (reference: run_pipline.py:11-33 does this orchestration-side). */
  def marketHours(spark: SparkSession, dir: String): DataFrame = {
    val minuteOfDay = hour(col("ts")) * 60 + minute(col("ts"))
    Tables.events(spark, dir)
      .filter(minuteOfDay.between(9 * 60 + 15, 15 * 60 + 30) &&
              weekday(col("ts")) <= 4)
      .select(col("event_id"), col("ts"), col("event_type"))
      .presentSorted(col("event_id"))
  }

  /** A4: batch parquet scan with a time-range filter + narrow projection —
    * the read-back surface (reference: README.md:386-405).
    *
    * The predicate is applied to the RAW stored column (epoch-nanos BIGINT
    * when the file carries TIMESTAMP(NANOS)), NOT to the
    * timestamp-converted expression Tables.events derives — a filter on a
    * derived expression cannot reach the file source, which at 100 TB
    * means a full-table scan. With the raw-column filter the physical plan
    * shows PushedFilters + a 3-column ReadSchema (asserted by PlanSpec);
    * on a date-partitioned production layout the same predicate becomes
    * partition pruning. */
  def scanPruned(spark: SparkSession, dir: String): DataFrame = {
    val utc = java.time.ZoneOffset.UTC
    val lo  = java.time.LocalDate.of(2024, 1, 15).atStartOfDay(utc).toInstant
    val hi  = java.time.LocalDate.of(2024, 1, 16).atStartOfDay(utc).toInstant
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val filtered = raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) surfaced as epoch-nanos BIGINT
        raw.filter(col("ts") >= lit(lo.getEpochSecond * 1000000000L) &&
                   col("ts") <  lit(hi.getEpochSecond * 1000000000L))
      case _ =>
        raw.filter(col("ts") >= lit(java.sql.Timestamp.from(lo)) &&
                   col("ts") <  lit(java.sql.Timestamp.from(hi)))
    }
    filtered.select(col("event_id"), col("value")).presentSorted(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cast_str_int"   -> castStrInt _,
    "epoch_ms_ts"    -> epochMsTs _,
    "epoch_sec_ts"   -> epochSecTs _,
    "to_date_op"     -> toDateOp _,
    "to_json_row"    -> toJsonRow _,
    "notnull_filter" -> notnullFilter _,
    "market_hours"   -> marketHours _,
    "scan_pruned"    -> scanPruned _)

  private val kSql = "CAST(props->>'$.k' AS INTEGER)"

  val oracles: Map[String, String] = Map(
    "cast_str_int" ->
      s"""SELECT event_id, CAST($kSql AS VARCHAR) AS ltq_str,
         |  $kSql AS ltq, CAST(user_id AS VARCHAR) AS user_str
         |FROM events ORDER BY event_id""".stripMargin,
    "epoch_ms_ts" ->
      """SELECT event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ltt_ms,
        |  make_timestamp(epoch_ms(CAST(ts AS TIMESTAMP)) * 1000) AS event_time
        |FROM events ORDER BY event_id""".stripMargin,
    "epoch_sec_ts" ->
      """SELECT event_id,
        |  make_timestamp((epoch_ms(CAST(ts AS TIMESTAMP)) // 1000) * 1000000) AS tick_time
        |FROM events ORDER BY event_id""".stripMargin,
    "to_date_op" ->
      "SELECT event_id, CAST(ts AS DATE) AS date FROM events ORDER BY event_id",
    "to_json_row" ->
      """SELECT event_id,
        |  CAST(to_json(struct_pack(event_id := event_id,
        |    event_type := event_type, user_id := user_id)) AS VARCHAR) AS value
        |FROM events ORDER BY event_id""".stripMargin,
    "notnull_filter" ->
      s"""SELECT event_id, $kSql AS ltq, value AS ltp FROM events
         |WHERE $kSql % 7 <> 0 AND user_id % 5 <> 0
         |ORDER BY event_id""".stripMargin,
    "market_hours" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
        |WHERE EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts)
        |        BETWEEN 555 AND 930
        |  AND isodow(CAST(ts AS DATE)) <= 5
        |ORDER BY event_id""".stripMargin,
    "scan_pruned" ->
      """SELECT event_id, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
        |ORDER BY event_id""".stripMargin)
}
