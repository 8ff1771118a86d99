package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

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
      .orderBy(col("region"), col("nation"))
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
      .orderBy(col("o_orderpriority"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_star_revenue"   -> starRevenue _,
    "join_segment_orders" -> segmentOrders _)

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
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
