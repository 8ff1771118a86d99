package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Join surface over the star-schema tables. The reference itself has NO
  * joins (SURVEY.md §2.G) — these exist because a real analytics engine
  * at 100 TB lives or dies on its join strategy, and the extension
  * operators (LSH buckets, IVF cells) already lean on joins implicitly.
  * This module makes the strategy choices explicit and gate-verified:
  *
  *  - fact ⋈ fact (lineitem ⋈ orders): hash-partitioned SHUFFLE join on
  *    the key both sides are large on — the only correct shape when
  *    neither side fits in memory.
  *  - fact ⋈ dims (customer, nation, region): BROADCAST joins — the dims
  *    are orders of magnitude smaller; broadcasting them removes three
  *    shuffles of the fact table. `broadcast()` is explicit so the plan
  *    does not depend on autoBroadcastJoinThreshold stats at deploy
  *    time.
  *  - AQE (enabled in Sessions) re-plans skewed shuffle joins at runtime
  *    (skew-join split), so a hot key degrades a task, not the stage.
  *
  * DOUBLE revenue terms are summed in DECIMAL and cast back so results
  * do not depend on partition merge order (SURVEY §7.5.1).
  */
object Joins {

  /** Star join: revenue per region/nation — one shuffle join between the
    * two fact tables, every dimension broadcast. */
  def starRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
              (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .as("rev"))
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(spark, dir).select("r_regionkey", "r_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))            // shuffle
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))  // broadcast
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_lineitems"),
           sum(col("rev").cast(DecimalType(28, 6))).cast(DoubleType)
             .as("revenue"))
      .presentSorted(col("region"), col("nation"))
  }

  /** Broadcast-pruned dimension filter: fact rows for one market
    * segment — the dim filter prunes BEFORE the fact shuffle, so only
    * matching customers' orders move. */
  def segmentOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(28, 6))).cast(DoubleType)
             .as("total_price"))
      .presentSorted(col("o_orderpriority"))
  }

  /** EXISTS as a left-SEMI join: customers with at least one urgent
    * order, counted per segment. Semi carries NO payload columns from the
    * probe side and emits each build row at most once — at 100 TB that
    * means the orders side ships only its join key and the join never
    * multiplies rows (an inner-join + distinct formulation shuffles the
    * full match multiplicity first, then pays a second exchange to
    * de-duplicate). */
  def semiUrgentCustomers(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           sum(col("c_acctbal").cast(DecimalType(28, 6))).cast(DoubleType)
             .as("sum_acctbal"))
      .presentSorted(col("c_mktsegment"))
  }

  /** NOT EXISTS as a left-ANTI join: customers who never placed an
    * URGENT order (every customer has SOME order in the fixture, so the
    * urgency predicate is what keeps this query's result non-empty —
    * 203/1500 at sf0.01). Same single-shuffle, key-only-payload
    * economics as the semi; the priority filter prunes the build side
    * BEFORE it ships. */
  def antiIdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .presentSorted(col("c_custkey"))
  }

  /** Correlated scalar subquery, written the way a SQL user writes it —
    * "orders above their customer's average" — and executed the way an
    * engine must run it at 100 TB: Catalyst DECORRELATES the subquery
    * into one aggregate + one join (asserted in PlanSpec), never a
    * per-outer-row subquery execution (which would be O(orders) separate
    * aggregations). The per-customer mean derives from an exact DECIMAL
    * sum / count in BOTH dialects so the threshold compare can't flake
    * on accumulation order. */
  def aboveAvgOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM graft_orders_v o
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
        |           / count(*)
        |  FROM graft_orders_v o2
        |  WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_star_revenue"   -> starRevenue _,
    "join_segment_orders" -> segmentOrders _,
    "join_semi_exists"    -> semiUrgentCustomers _,
    "join_anti_orphans"   -> antiIdleCustomers _,
    "above_avg_orders"    -> aboveAvgOrders _)

  val oracles: Map[String, String] = Map(
    "join_star_revenue" ->
      """SELECT r_name AS region, n_name AS nation,
        |  count(*) AS n_lineitems,
        |  CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
        |               AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "join_segment_orders" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_semi_exists" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS sum_acctbal
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_anti_orphans" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "above_avg_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
        |           / count(*)
        |  FROM orders o2
        |  WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
}
