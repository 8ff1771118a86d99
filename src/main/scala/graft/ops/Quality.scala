package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Data-quality expectation suite — the dbt-test / Deequ-style
  * constraint checks a production pipeline runs on every load before
  * publishing a table (no reference-repo counterpart; the reference
  * trusts its feed — SURVEY.md §5 notes the absence of validation as a
  * gap a re-engineering must fill).
  *
  * Scale shape is the whole point: naive expectation runners issue one
  * query PER CHECK (k full scans for k checks). Here every check over
  * the same table rides ONE scan as conditional aggregates
  * (`sum(when(...))` — map-side partials, one exchange to a single
  * row), the referential check is a key-only anti-join, and the check
  * rows are exploded from the aggregate row. k checks over a 100 TB
  * table cost one pass, plus one join for each cross-table constraint.
  *
  * The observability twin [[withObservation]] attaches the same
  * conditional aggregates to a PASSING query via `Dataset.observe` —
  * zero extra scans, metrics delivered to a QueryExecutionListener on
  * completion (pinned in QualitySpec) — the shape for continuously
  * monitoring a pipeline rather than gating a load.
  */
object Quality {

  /** Gate query: one row per expectation with its violation count and
    * pass flag. lineitem checks share one scan; orders checks share one
    * scan; the orphan check is the one extra (anti-join) pass. */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)

    val liAgg = li.agg(
      sum(when(col("l_orderkey").isNull, 1L).otherwise(0L))
        .as("lineitem_null_orderkey"),
      sum(when(col("l_quantity") <= 0.0, 1L).otherwise(0L))
        .as("lineitem_nonpositive_qty"),
      sum(when(col("l_extendedprice") < 0.0, 1L).otherwise(0L))
        .as("lineitem_negative_price"))
    val ordAgg = ord.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey")))
        .as("orders_dup_orderkey"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
        .as("orders_null_custkey"))
    val orphan = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("lineitem_orphan_orderkey"))

    // one row each → explode to (check_name, n_violations) rows
    def unpivot(agg: DataFrame): DataFrame = {
      val cols = agg.columns
      agg.select(explode(array(cols.map(c =>
        struct(lit(c).as("check_name"), col(c).as("n_violations"))): _*))
          .as("kv"))
        .select(col("kv.check_name"), col("kv.n_violations"))
    }
    unpivot(liAgg).unionByName(unpivot(ordAgg)).unionByName(unpivot(orphan))
      .withColumn("passed",
                  when(col("n_violations") === 0L, 1).otherwise(0)
                    .cast(IntegerType))
      .presentSorted(col("check_name"))
  }

  /** Data-completeness audit: which (day × event_type × user-cohort)
    * slots of the expected calendar spine have NO events — the "did
    * yesterday's partition actually land, for every source?" check that
    * catches silently-dropped feeds, which no per-row expectation can
    * see (absent rows violate nothing).
    *
    * Scale shape: the SPINE is tiny by construction (days × types ×
    * cohorts — thousands of rows at any corpus size), built from a
    * 1-row bounds aggregate and exploded sequences, then broadcast
    * against the DISTINCT observed slots (a map-side-combined
    * aggregation of the big table — shuffled bytes O(slots), not
    * O(events)). The anti-join emits only the missing slots. */
  def coverageGaps(spark: SparkSession, dir: String,
                   cohorts: Int = 100): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"),
              (col("user_id") % cohorts).as("cohort"))
    // ONE scan of the big table; bounds and the type domain are
    // derivable from the distinct-slot frame (min/max/distinct survive
    // the distinct), which is O(slots) — pin it (CacheScope-released)
    // because three plan branches consume it and Spark shares no DAG
    // between branches (the eager count prevents the concurrent-
    // materialization race)
    val observed = graft.CacheScope.pin(ev.distinct())
    observed.count()
    val spine = observed.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .crossJoin(observed.select(col("event_type")).distinct())
      .crossJoin(spark.range(cohorts).select(col("id").as("cohort")))
    spine.join(observed, Seq("day", "event_type", "cohort"), "left_anti")
      .presentSorted(col("day"), col("event_type"), col("cohort"))
  }

  /** Percentile winsorization — the outlier-clipping step a feature /
    * metrics pipeline runs before training or aggregation: clamp each
    * group's values into its [p05, p95] band and report how much was
    * clipped. Quantiles are `percentile_disc` (actual data values, so
    * the bounds are bit-identical across engines — [[Stats]] explains
    * why interpolated quantiles can't face a hash gate).
    *
    * Scale shape: pass 1 computes the per-group bounds (one exchange;
    * exact percentile buffers each group's values — at 100 TB swap in
    * approx_percentile's mergeable t-digest, same plan shape); the
    * bounds table is O(groups) and joins back BROADCAST, so the big
    * table is never shuffled for the clamp; pass 2 is map-side-combined
    * conditional aggregates. The clipped sum accumulates in DECIMAL
    * (associative, order-insensitive) and is cast back to DOUBLE at the
    * end — the [[Stats.profileStats]] determinism pattern. */
  def winsorizeStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val bounds = ev.groupBy(col("event_type")).agg(
      expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").as("lo"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").as("hi"))
    val clipped = greatest(col("lo"), least(col("hi"), col("value")))
    ev.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"))
      .agg(
        min(col("lo")).as("lo"),
        min(col("hi")).as("hi"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_high"),
        sum(clipped.cast(DecimalType(28, 6))).cast(DoubleType)
          .as("clipped_sum"))
      .presentSorted(col("event_type"))
  }

  /** Attach the lineitem expectations to any lineitem-shaped frame as a
    * zero-cost observation: same conditional aggregates, no extra scan,
    * metrics arrive via QueryExecutionListener (or the returned frame's
    * own `queryExecution.observedMetrics`) when an action completes.
    * Caveat pinned in QualitySpec: the action must execute THIS frame's
    * plan — `collect`/`write` do; `count()` builds a derived aggregate
    * whose metrics land on a different QueryExecution. */
  def withObservation(df: DataFrame, name: String = "graft_dq"): DataFrame =
    df.observe(name,
      count(lit(1)).as("rows"),
      sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("null_keys"),
      sum(when(col("l_quantity") <= 0.0, 1L).otherwise(0L)).as("nonpos_qty"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_checks" -> dqChecks _,
    "coverage_gaps" -> ((s, d) => coverageGaps(s, d)),
    "winsorize_stats" -> winsorizeStats _)

  val oracles: Map[String, String] = Map(
    "winsorize_stats" ->
      """WITH b AS (
        |  SELECT event_type,
        |    quantile_disc(value, 0.05) AS lo,
        |    quantile_disc(value, 0.95) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, min(b.lo) AS lo, min(b.hi) AS hi,
        |  CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low,
        |  CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_high,
        |  CAST(sum(CAST(greatest(b.lo, least(b.hi, e.value))
        |                AS DECIMAL(28,6))) AS DOUBLE) AS clipped_sum
        |FROM events e JOIN b ON e.event_type = b.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "coverage_gaps" ->
      """WITH e AS (
        |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    event_type, user_id % 100 AS cohort
        |  FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |    AS day
        |  FROM b),
        |full_s AS (
        |  SELECT day, event_type, cohort
        |  FROM spine
        |  CROSS JOIN (SELECT DISTINCT event_type FROM events)
        |  CROSS JOIN (SELECT unnest(range(100)) AS cohort))
        |SELECT f.day, f.event_type, f.cohort
        |FROM full_s f LEFT JOIN e
        |  ON f.day = e.day AND f.event_type = e.event_type
        |     AND f.cohort = e.cohort
        |WHERE e.day IS NULL
        |ORDER BY f.day, f.event_type, f.cohort""".stripMargin,
    "dq_checks" ->
      """WITH li AS (
        |  SELECT
        |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS lineitem_null_orderkey,
        |    CAST(sum(CASE WHEN l_quantity <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS lineitem_nonpositive_qty,
        |    CAST(sum(CASE WHEN l_extendedprice < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS lineitem_negative_price
        |  FROM lineitem),
        |o AS (
        |  SELECT
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |      AS orders_dup_orderkey,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS orders_null_custkey
        |  FROM orders),
        |orph AS (
        |  SELECT CAST(count(*) AS BIGINT) AS lineitem_orphan_orderkey
        |  FROM lineitem l LEFT JOIN orders ord ON l.l_orderkey = ord.o_orderkey
        |  WHERE ord.o_orderkey IS NULL),
        |rows_u AS (
        |  SELECT 'lineitem_null_orderkey' AS check_name,
        |         lineitem_null_orderkey AS n_violations FROM li
        |  UNION ALL
        |  SELECT 'lineitem_nonpositive_qty', lineitem_nonpositive_qty FROM li
        |  UNION ALL
        |  SELECT 'lineitem_negative_price', lineitem_negative_price FROM li
        |  UNION ALL
        |  SELECT 'orders_dup_orderkey', orders_dup_orderkey FROM o
        |  UNION ALL
        |  SELECT 'orders_null_custkey', orders_null_custkey FROM o
        |  UNION ALL
        |  SELECT 'lineitem_orphan_orderkey', lineitem_orphan_orderkey FROM orph)
        |SELECT check_name, n_violations,
        |  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INTEGER) AS passed
        |FROM rows_u ORDER BY check_name""".stripMargin)
}
