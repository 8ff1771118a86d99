package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Cardinality and quantile surface.
  *
  * `count(DISTINCT …)` in Spark plans as Expand + two-level aggregation —
  * the distinct-key dedup happens DISTRIBUTED, partitioned by (group,
  * distinct-key), then partials merge per group: no collected value sets,
  * no driver involvement, which is what makes it survive a 100 TB column.
  * (When several DISTINCT columns share one query the Expand multiplies
  * input rows by the distinct-clause count — the documented cost; the
  * sketch path in SketchSpec is the one-pass mergeable alternative at
  * scale.)
  *
  * Quantiles are `percentile_disc` — the DISCRETE quantile (smallest
  * actual value whose cumulative distribution ≥ p). Discrete, not
  * continuous, deliberately: disc returns a value that EXISTS in the
  * data, so two engines agree bit-for-bit, while cont interpolates with
  * float arithmetic whose rounding is engine-specific — a hash-gate
  * flake, and a meaningless distinction at data scale (adjacent order
  * statistics converge). Exact percentile buffers the group's values on
  * the executor (OOM risk for one giant group at 100 TB); production
  * uses approx_percentile (t-digest, bounded memory, mergeable) — bounds
  * verified in SketchSpec — and the exact form stays the small-group /
  * oracle tool.
  */
object Stats {

  /** Per-series user cardinality — exact distributed count(DISTINCT). */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"))
      .presentSorted(col("event_type"))

  /** Per-series quartiles of `value` via discrete percentiles. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(min(col("value")).as("v_min"),
           expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").as("q25"),
           expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("q50"),
           expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").as("q75"),
           max(col("value")).as("v_max"))
      .presentSorted(col("event_type"))

  /** Column profile (n / mean / variance / stddev) with DETERMINISTIC
    * moments: both engines' `var_pop`/`stddev` accumulate doubles in
    * partition order, so their last bits differ run-to-run — a hash-gate
    * flake and a real reproducibility bug in any pipeline that diffs
    * profiles between runs. Instead both sides compute the two exact
    * DECIMAL power sums (Σx, Σx²) and derive
    * `var = Σx²/n − (Σx/n)²` in float from those — same exact inputs,
    * same scalar expression, bit-identical output, still one shuffle. */
  def profileStats(spark: SparkSession, dir: String): DataFrame = {
    val v = col("value")
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(v.cast(DecimalType(28, 6))).cast(DoubleType).as("s1"),
           sum((v * v).cast(DecimalType(28, 6))).cast(DoubleType).as("s2"))
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("var_pop",
        col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))
      .withColumn("stddev_pop", sqrt(col("var_pop")))
      .presentSorted(col("event_type"))
  }

  /** Nested-type aggregation output: the distinct event-type SET per
    * user. `collect_list`'s element order is partition-arrival order
    * (nondeterministic); `array_distinct` + `sort_array` normalizes it to
    * a canonical form both engines agree on. The gate output is the
    * canonical set SERIALIZED to a comma-joined scalar — raw array
    * columns cannot ride a hash-compared gate (the checker sorts by
    * every column and arrays aren't hashable/orderable there); the
    * scalar encoding carries identical information and compares
    * byte-for-byte. */
  def userEventSets(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           concat_ws(",",
             sort_array(array_distinct(collect_list(col("event_type")))))
             .as("event_types"))
      .presentSorted(col("user_id"))

  /** Calendar-bucketed reporting rollup: events per (day, type).
    * date_trunc keeps the column a timestamp (partition-pruning-friendly
    * against a date-partitioned 100 TB layout, where this groupBy rides
    * the same day key as the directory structure). */
  def dailyCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).cast(TimestampNTZType).as("day"),
               col("event_type"))
      .agg(count(lit(1)).as("n"))
      .presentSorted(col("day"), col("event_type"))

  /** Fixed-width histogram of `value` — bucket index from integer-exact
    * arithmetic (floor of a clean division; both engines agree bit-wise,
    * unlike engine-specific `width_bucket` edge conventions). One
    * shuffle of O(buckets) partials. */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(floor(col("value") / 10.0).cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .presentSorted(col("bucket"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "distinct_counts" -> distinctCounts _,
    "percentiles"     -> percentiles _,
    "profile_stats"   -> profileStats _,
    "user_event_sets" -> userEventSets _,
    "daily_counts"    -> dailyCounts _,
    "value_histogram" -> valueHistogram _)

  val oracles: Map[String, String] = Map(
    "distinct_counts" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "percentiles" ->
      """SELECT event_type, min(value) AS v_min,
        |  quantile_disc(value, 0.25) AS q25,
        |  quantile_disc(value, 0.5)  AS q50,
        |  quantile_disc(value, 0.75) AS q75,
        |  max(value) AS v_max
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "profile_stats" ->
      """WITH sums AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1)
        |SELECT event_type, n, s1, s2,
        |  s1 / n AS mean,
        |  s2 / n - (s1 / n) * (s1 / n) AS var_pop,
        |  sqrt(s2 / n - (s1 / n) * (s1 / n)) AS stddev_pop
        |FROM sums ORDER BY event_type""".stripMargin,
    "user_event_sets" ->
      """SELECT user_id, count(*) AS n_events,
        |  array_to_string(list_sort(list_distinct(list(event_type))), ',')
        |    AS event_types
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "daily_counts" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "value_histogram" ->
      """SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
