package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Multi-level aggregation surface: grouping sets (ROLLUP/CUBE), pivot,
  * and the salted two-stage aggregation that keeps a skewed key from
  * serializing a stage. The reference aggregates on exactly one level
  * (its tumbling candle groupBy — SURVEY §2.E2); a warehouse user of the
  * engine asks for subtotal/grand-total rows and wide-format exports on
  * day one, so these are engine capabilities like ops/Joins.
  *
  * Scale posture: Spark expands grouping sets BEFORE the exchange (the
  * Expand operator emits one row per grouping set per input row, then ONE
  * hash shuffle aggregates them all) — a rollup over k levels costs one
  * shuffle of (k+1)× the map-side-combined partials, not k separate
  * aggregation jobs over the fact table, which is the naive formulation's
  * cost. Pivot with an EXPLICIT value list plans as two aggregations, but
  * only the FIRST — (key, pivotcol), map-side combined — touches the fact
  * table; the pivotfirst re-shuffle moves O(groups) rows. Pinning the
  * values also kills the domain-discovery pass an implicit pivot runs (a
  * distinct query collected to the driver: at 100 TB that is a full table
  * scan before the real job even starts).
  *
  * All DOUBLE measures accumulate in DECIMAL and cast back (SURVEY
  * §7.5.1) so partition merge order cannot flake the oracle hash.
  */
object Grouping {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(28, 6))).cast(DoubleType)

  /** ROLLUP over (returnflag, linestatus): detail, per-flag subtotals,
    * grand total — one Expand + one shuffle. `gid` is the standard
    * grouping-set bit vector (leftmost key = MSB, bit set ⇔ key rolled
    * up), the only reliable way for a consumer to tell a subtotal row
    * from a detail row whose key is genuinely NULL. */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      // pre-project the measures: agg input expressions are evaluated
      // AFTER Expand, so an inline multiply-and-cast would run (levels+1)×
      // per input row; computed here each runs once and Expand copies
      // the finished decimal
      .select(col("l_returnflag"), col("l_linestatus"),
              col("l_quantity").cast(DecimalType(28, 6)).as("qty_dec"),
              (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .cast(DecimalType(28, 6)).as("rev_dec"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
           count(lit(1)).as("n_rows"),
           sum(col("qty_dec")).cast(DoubleType).as("sum_qty"),
           sum(col("rev_dec")).cast(DoubleType).as("revenue"))
      .presentSorted(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** CUBE over (orderstatus, orderpriority): all 4 grouping sets from
    * the same single Expand + shuffle. */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"),
           count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("total_price"))
      .presentSorted(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  /** Wide-format export: one row per returnflag, one column pair per
    * linestatus. The value list is PINNED (F/O) so the plan is a single
    * conditional aggregation — no driver-side domain discovery pass. */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .presentSorted(col("l_returnflag"))

  /** Long-format inverse of [[pivotStatus]] — native `unpivot`/melt
    * (Spark 3.4+), the wide→long reshape every reporting export needs
    * going the other way. Per-row Expand (each input row becomes one
    * row per melted column) — no shuffle beyond what built the wide
    * frame; the value columns must share a type, so this melts the
    * count pair and derives the status key from the column name. The
    * gate proves melt(pivot(x)) round-trips to the long form the
    * oracle computes directly. */
  def unpivotStatus(spark: SparkSession, dir: String): DataFrame =
    pivotStatus(spark, dir)
      .unpivot(Array(col("l_returnflag")),
               Array(col("F_n"), col("O_n")),
               "melted", "n")
      .select(col("l_returnflag"),
              substring(col("melted"), 1, 1).as("l_linestatus"),
              col("n"))
      .presentSorted(col("l_returnflag"), col("l_linestatus"))

  /** Number of salt shards for [[saltedAgg]]. 16 shards × 5 event types
    * = 80 partial groups — enough to spread a hot key across a 32-core
    * box; at cluster scale the dial rises with executor count. */
  private val SaltShards = 16

  /** Salted two-stage aggregation over a LOW-CARDINALITY skewed key.
    *
    * `events.event_type` has 5 values — a plain groupBy hashes the whole
    * table onto 5 reducer partitions and the hottest key serializes the
    * stage (AQE skew-split does NOT help an aggregation: a key's rows
    * must meet in one task). The classic fix, made explicit: stage 1
    * groups by (key, salt) — `event_id % 16`, deterministic, no rand() —
    * spreading each key over [[SaltShards]] partials; stage 2 re-groups
    * the 80 partial rows by key alone. Both aggregates are algebraic
    * (count→sum, sum→sum), so the rewrite is exact; the second shuffle
    * moves partial rows (O(keys × shards)), not data.
    *
    * The oracle is the UNSALTED single-stage groupBy — the gate proves
    * the rewrite is semantics-preserving, which is the entire point of
    * salting. */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), pmod(col("event_id"), lit(SaltShards)).as("salt"))
      .agg(count(lit(1)).as("pn"),
           sum(col("value").cast(DecimalType(28, 6))).as("psum"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_events"),
           sum(col("psum")).cast(DoubleType).as("sum_value"))
      .withColumn("avg_value", col("sum_value") / col("n_events"))
      .presentSorted(col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rollup_revenue" -> rollupRevenue _,
    "cube_orders"    -> cubeOrders _,
    "pivot_status"   -> pivotStatus _,
    "unpivot_status" -> unpivotStatus _,
    "salted_agg"     -> saltedAgg _)

  val oracles: Map[String, String] = Map(
    "rollup_revenue" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
        |               AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 3, 1, 2""".stripMargin,
    "cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY 3, 1, 2""".stripMargin,
    "unpivot_status" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    count(*) FILTER (WHERE l_linestatus = 'F') AS F_n,
        |    count(*) FILTER (WHERE l_linestatus = 'O') AS O_n
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, substr(melted, 1, 1) AS l_linestatus, n
        |FROM wide UNPIVOT (n FOR melted IN (F_n, O_n))
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "pivot_status" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS F_n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6)))
        |       FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS F_qty,
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS O_n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6)))
        |       FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS O_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "salted_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
