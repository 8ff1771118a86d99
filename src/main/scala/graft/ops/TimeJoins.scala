package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Temporal joins — the two join shapes every market-data stack needs and
  * vanilla Spark SQL has no operator for (SURVEY §2.G notes the reference
  * itself joins nothing; these are engine capabilities, like ops/Joins):
  *
  *  - AS-OF: attach the most recent quote at-or-before each trade, per
  *    instrument. The naive formulation is a correlated subquery or an
  *    inequality join + argmax — O(trades × quotes) pairs. The scalable
  *    form used here is the classic union trick: tag both sides, union,
  *    ONE hash shuffle on the key, one in-partition sort on (ts, tag),
  *    and a running `last(quote, ignoreNulls)` window — O(n log n) per
  *    key and zero pair blow-up. This is how kdb/Flink/DuckDB execute
  *    ASOF internally; in Spark it composes from Exchange + Sort +
  *    WindowExec, all whole-stage-codegen-friendly.
  *  - RANGE ("clicks within 10 minutes after each error"): a raw
  *    `t2.ts BETWEEN t1.ts AND t1.ts + w` predicate has no equi-key, so
  *    Catalyst plans BroadcastNestedLoopJoin — a cartesian at 100 TB.
  *    Bucketing the time axis by the window length restores an equi-key:
  *    the probe side lands in exactly ⌈w/bucket⌉+1 = 2 candidate buckets,
  *    the join shuffles on `bucket`, and the range predicate survives
  *    only as a residual filter on the matched pairs.
  *
  * Determinism: as-of ordering ties are broken by (ts, tag, event_id) —
  * a quote and a trade at the same instant resolve quote-first, so the
  * trade SEES the co-timestamped quote (inclusive `>=` semantics,
  * matching DuckDB's ASOF JOIN).
  *
  * Skew posture: the as-of shuffle is keyed by instrument — a hot
  * instrument degrades one task, and AQE skew-split handles it because
  * the window partitions by the same key the Exchange hashed. The range
  * join is keyed by time bucket, so load spreads with wall-clock time —
  * a flash-crash minute is one bucket; salting the bucket with a
  * low-cardinality suffix is the documented escape hatch.
  */
object TimeJoins {

  /** Generic as-of join: for every row of `probe`, the latest `build` row
    * with build.ts <= probe.ts on the same `key`. Both inputs must carry
    * (key, ts, id, value); output keeps probe's columns plus the matched
    * (quote_ts, quote_value), null when no quote precedes.
    */
  def asofJoin(probe: DataFrame, build: DataFrame,
               key: String): DataFrame = {
    val q = build.select(col(key), col("ts"), col("event_id").as("eid"),
                         lit(0).as("tag"), col("value").as("qval"),
                         col("ts").as("qts"),
                         lit(null).cast(DoubleType).as("tval"))
    val t = probe.select(col(key), col("ts"), col("event_id").as("eid"),
                         lit(1).as("tag"),
                         lit(null).cast(DoubleType).as("qval"),
                         lit(null).cast(TimestampNTZType).as("qts"),
                         col("value").as("tval"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("ts"), col("tag"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q.unionByName(t)
      .withColumn("quote_value", last(col("qval"), ignoreNulls = true).over(w))
      .withColumn("quote_ts", last(col("qts"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col(key), col("ts").as("trade_ts"), col("eid").as("trade_id"),
              col("tval").as("trade_value"), col("quote_ts"),
              col("quote_value"))
  }

  /** Gate query: each purchase event joined as-of to the user's latest
    * click at-or-before it — the quote/trade matching shape on the
    * events table. */
  def asofQuoteTrade(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
              col("event_type"))
    val quotes = ev.filter(col("event_type") === "click")
    val trades = ev.filter(col("event_type") === "purchase")
    asofJoin(trades, quotes, "user_id")
      .presentSorted(col("user_id"), col("trade_ts"), col("trade_id"))
  }

  private val WindowUs = 10L * 60L * 1000000L // 10 minutes, integer µs

  /** Bucket index by INTEGER floor-division (`div` on the pmod-floored
    * numerator, pmod non-negative) — not `floor(us / W)`: double
    * division drifts once |us| nears 2^53 (year ~2255, or any backfilled
    * pre-1970 data), and the two-bucket cover proof needs bucket
    * arithmetic EXACT for every representable timestamp. Takes the
    * COLUMN NAME (SQL `div` has no Column-API form). */
  private def bucketOfUs(usCol: String): Column =
    expr(s"($usCol - pmod($usCol, ${WindowUs}L)) div ${WindowUs}L")

  private def usOf(ts: Column): Column = unix_micros(ts.cast(TimestampType))

  /** Gate query: for every error event, how many clicks follow within
    * [err_ts, err_ts + 10 min) — bucketed equi-join on the time axis,
    * left so zero-click errors keep their row. With bucket = window
    * length each error probes exactly its own and the next bucket; a
    * click is matched in its single home bucket, so no dedup pass is
    * needed after the residual filter.
    */
  def rangeJoinFollowers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
      // generators cannot nest inside expressions — explode the offset
      // first, then add it to the home bucket
      .withColumn("k", explode(array(lit(0L), lit(1L))))
      .withColumn("us", usOf(col("err_ts")))
      .withColumn("bucket", bucketOfUs("us") + col("k"))
      .drop("k", "us")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withColumn("us", usOf(col("click_ts")))
      .withColumn("bucket", bucketOfUs("us"))
      .drop("us")
    errors.join(clicks,
        errors("bucket") === clicks("bucket") &&
          col("click_ts") >= col("err_ts") &&
          col("click_ts") < col("err_ts") + expr("INTERVAL 10 MINUTES"),
        "left")
      .groupBy(col("err_id"), col("err_ts"))
      .agg(count(col("click_id")).as("n_clicks_10m"))
      .presentSorted(col("err_id"))
  }

  /** Gate query: the NAIVE inequality-only range join — the formulation
    * every user writes first, with no hand-bucketing. Scales ONLY
    * because [[graft.plans.RewriteRangeJoin]] (installed via
    * GraftExtensions) rewrites it into the bucketed equi-join shape of
    * [[rangeJoinFollowers]]; without the rule this plans
    * BroadcastNestedLoopJoin (RangeJoinRuleSpec holds both directions).
    * Inner join, so only errors with ≥ 1 following click appear —
    * the left/zero-count variant is [[rangeJoinFollowers]]. */
  def rangeJoinNaive(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    errors.join(clicks,
        col("click_ts") >= col("err_ts") &&
          col("click_ts") < col("err_ts") + expr("INTERVAL 10 MINUTES"))
      .groupBy(col("err_id"), col("err_ts"))
      .agg(count(lit(1)).as("n_clicks_10m"))
      .presentSorted(col("err_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_quote_trade" -> asofQuoteTrade _,
    "range_join_10m"   -> rangeJoinFollowers _,
    "range_join_auto"  -> rangeJoinNaive _)

  val oracles: Map[String, String] = Map(
    // DuckDB executes ASOF JOIN natively — an independent implementation
    // of the same inclusive (>=) semantics the union-window plan has.
    "asof_quote_trade" ->
      """WITH q AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'click'),
        |t AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT t.user_id, t.ts AS trade_ts, t.event_id AS trade_id,
        |  t.value AS trade_value, q.ts AS quote_ts, q.value AS quote_value
        |FROM t ASOF LEFT JOIN q
        |  ON t.user_id = q.user_id AND t.ts >= q.ts
        |ORDER BY t.user_id, trade_ts, trade_id""".stripMargin,
    "range_join_10m" ->
      """SELECT e.event_id AS err_id, CAST(e.ts AS TIMESTAMP) AS err_ts,
        |  count(c.event_id) AS n_clicks_10m
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 minute
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "range_join_auto" ->
      """SELECT e.event_id AS err_id, CAST(e.ts AS TIMESTAMP) AS err_ts,
        |  count(*) AS n_clicks_10m
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 minute
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin)
}
