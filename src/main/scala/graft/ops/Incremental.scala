package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Incremental aggregation by partial-state merge — the pattern that
  * lets a 100 TB pipeline maintain a monthly rollup WITHOUT rescanning
  * raw history on every load: each day's load materializes a small
  * per-(day, group) partial-aggregate table, and the reporting rollup
  * re-aggregates the partials (sum of counts, sum of sums, min of mins,
  * max of maxs). Every statistic here is chosen MERGEABLE — the
  * algebraic property (count/sum/min/max, and avg derived from sum and
  * count at the end) that makes two-level aggregation lossless; a
  * non-mergeable statistic (median, exact distinct) must instead keep a
  * mergeable sketch, the [[Stats]] HLL/t-digest posture.
  *
  * The gate query runs both levels in ONE plan: raw → daily partials →
  * monthly merge, against an oracle that aggregates raw → monthly
  * DIRECTLY — the equality is the proof the merge loses nothing.
  * IncrementalSpec additionally round-trips the partials through
  * parquet (materialize days, merge from disk) the way a real
  * incremental job would.
  *
  * Scale shape: level 1 is a map-side-combined hash agg whose output is
  * O(days × groups) — tiny at any raw volume; level 2 re-aggregates
  * that tiny frame, and Catalyst needs no second full exchange of raw
  * data (the expensive scan happens exactly once per day's load in the
  * real pipeline, never at report time). Sums accumulate in DECIMAL
  * (associative, order-insensitive) and cast to DOUBLE only at the
  * edge — the [[Stats.profileStats]] determinism pattern.
  */
object Incremental {

  /** Daily partial-aggregate table: one row per (day, event_type). */
  def dailyPartials(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(28, 6))).as("sum_v"),
           min(col("value")).as("min_v"),
           max(col("value")).as("max_v"))

  /** Merge any partial table (daily or finer) up to monthly. */
  def mergeToMonthly(partials: DataFrame): DataFrame =
    partials
      .groupBy(trunc(col("day"), "month").as("month"), col("event_type"))
      .agg(sum(col("n")).as("n"),
           sum(col("sum_v")).as("sum_v"),
           min(col("min_v")).as("min_v"),
           max(col("max_v")).as("max_v"))
      // avg derives from the DOUBLE-cast sum (not decimal division,
      // whose result scale is engine-specific): double ÷ long is the
      // same IEEE op in both engines on identical inputs
      .select(col("month"), col("event_type"), col("n"),
              col("sum_v").cast(DoubleType).as("sum_v"),
              col("min_v"), col("max_v"))
      .withColumn("avg_v", col("sum_v") / col("n"))
      .presentSorted(col("month"), col("event_type"))

  def incrementalMonthly(spark: SparkSession, dir: String): DataFrame =
    mergeToMonthly(dailyPartials(spark, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "incremental_monthly" -> incrementalMonthly _)

  val oracles: Map[String, String] = Map(
    // The oracle aggregates raw directly to monthly — equality with the
    // two-level engine plan proves the partial merge is lossless.
    "incremental_monthly" ->
      """SELECT
        |  CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS DATE) AS month,
        |  event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_v,
        |  min(value) AS min_v,
        |  max(value) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*)
        |    AS avg_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
