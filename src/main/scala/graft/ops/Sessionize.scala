package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Present.PresentOps

/** Batch sessionization (gaps-and-islands) — the BATCH twin of the
  * streaming session window ([[Candles]]' `candles_session` /
  * `session_window`): group each user's events into sessions separated
  * by more than [[GapHours]] hours of silence, entirely with window
  * functions — the backfill path a streaming session pipeline needs when
  * it reprocesses history.
  *
  * Shape: ONE hash exchange on the session key (user), one in-partition
  * sort, then two window passes over the same partitioning (lag to mark
  * session starts, running sum to number them) that Catalyst executes in
  * a single WindowExec pipeline — no second shuffle; the per-session
  * aggregate then re-groups by (user, session) WITHIN the same
  * partitioning (child distribution satisfies it, so EnsureRequirements
  * inserts no exchange there either).
  *
  * At 100 TB the key decision is the same one [[TimeJoins.asofJoin]]
  * documents: per-user history must be co-located and sorted ONCE — any
  * formulation with a self-join on "previous event" devolves to a pair
  * blow-up. Gaps-and-islands is the O(n log n)-per-key form.
  */
object Sessionize {

  private val GapHours = 6

  /** One row per (user, session): bounds and size. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // NTZ has no direct numeric cast; via LTZ (identity under the UTC
    // session) to exact integer µs — gap compare in integers, no floats
    def micros(c: org.apache.spark.sql.Column) =
      unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
    val newSession = when(
      col("prev_ts").isNull ||
        micros(col("ts")) - micros(col("prev_ts")) > GapHours * 3600L * 1000000L,
      1L).otherwise(0L)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_start", newSession)
      .withColumn("session_idx",
        sum(col("is_start")).over(byUser.rowsBetween(Window.unboundedPreceding,
                                                     Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("sess_start"),
           max(col("ts")).as("sess_end"))
      .presentSorted(col("user_id"), col("session_idx"))
  }

  /** Ordered funnel analysis — how many users progressed view → click →
    * purchase IN ORDER (each step strictly after the previous one's
    * first occurrence): the standard product-analytics companion to
    * sessionization, and a sequence predicate no unordered groupBy can
    * express.
    *
    * Shape: three chained per-user window minimums over the SAME
    * partitioning — step N's timestamp is the earliest qualifying event
    * strictly after step N−1's — so the whole funnel rides ONE hash
    * exchange on user_id (EnsureRequirements inserts no exchange
    * between the window passes), then collapses to a single row of
    * step counts via map-side-combined partial aggregates. The
    * self-join formulation ("events × events on later-ts") this
    * replaces is a pair blow-up — the same anti-shape
    * [[Sessionize.sessionize]] documents. Deeper funnels are the same
    * plan with more chained windows: still one exchange. */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("s1",
        min(when(col("event_type") === "view", col("ts"))).over(byUser))
      .withColumn("s2",
        min(when(col("event_type") === "click" && col("ts") > col("s1"),
                 col("ts"))).over(byUser))
      .withColumn("s3",
        min(when(col("event_type") === "purchase" && col("ts") > col("s2"),
                 col("ts"))).over(byUser))
      .agg(
        countDistinct(when(col("s1").isNotNull, col("user_id")))
          .as("step1_view_users"),
        countDistinct(when(col("s2").isNotNull, col("user_id")))
          .as("step2_click_users"),
        countDistinct(when(col("s3").isNotNull, col("user_id")))
          .as("step3_purchase_users"))
  }

  /** Cohort retention — the activity-over-time matrix behind every
    * retention curve: users are grouped by their first-seen day (the
    * cohort) and counted on each later active day as an offset from
    * it. Rides the same single user-key exchange as the session ops
    * (window min for the cohort day), then one O(cohorts × days)
    * aggregation whose partials map-side-combine — shuffled bytes are
    * O(distinct (user, day)), not O(events), because the per-user
    * distinct day grid collapses before the final count. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("cohort_day", min(col("day")).over(byUser))
      .groupBy(col("cohort_day"),
               datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .presentSorted(col("cohort_day"), col("day_offset"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sessionize" -> sessionize _,
    "funnel_steps" -> funnelSteps _,
    "cohort_retention" -> cohortRetention _)

  val oracles: Map[String, String] = Map(
    "cohort_retention" ->
      """WITH d AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events),
        |c AS (
        |  SELECT user_id, day,
        |    min(day) OVER (PARTITION BY user_id) AS cohort_day
        |  FROM d)
        |SELECT cohort_day,
        |  CAST(day - cohort_day AS INTEGER) AS day_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "funnel_steps" ->
      """WITH w1 AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    min(CASE WHEN event_type = 'view'
        |             THEN CAST(ts AS TIMESTAMP) END)
        |      OVER (PARTITION BY user_id) AS s1
        |  FROM events),
        |w2 AS (
        |  SELECT *,
        |    min(CASE WHEN event_type = 'click' AND ts > s1 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s2
        |  FROM w1),
        |w3 AS (
        |  SELECT *,
        |    min(CASE WHEN event_type = 'purchase' AND ts > s2 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s3
        |  FROM w2)
        |SELECT
        |  count(DISTINCT CASE WHEN s1 IS NOT NULL THEN user_id END)
        |    AS step1_view_users,
        |  count(DISTINCT CASE WHEN s2 IS NOT NULL THEN user_id END)
        |    AS step2_click_users,
        |  count(DISTINCT CASE WHEN s3 IS NOT NULL THEN user_id END)
        |    AS step3_purchase_users
        |FROM w3""".stripMargin,
    "sessionize" ->
      """WITH o AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    lag(CAST(ts AS TIMESTAMP)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                   OR ts - prev_ts > INTERVAL 6 HOURS
        |                 THEN 1 ELSE 0 END AS is_start
        |  FROM o),
        |s AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS session_idx
        |  FROM m)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(ts) AS sess_start, max(ts) AS sess_end
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
