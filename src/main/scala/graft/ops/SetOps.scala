package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Present.PresentOps

/** SQL set operations (EXCEPT / INTERSECT) — cohort algebra. The
  * reference has none (SURVEY §2.G); any audience-building or eval-set
  * workflow hits them immediately ("clickers who never purchased").
  *
  * Scale shape: Spark plans `except`/`intersect` as a distinct
  * aggregation over each input followed by a left-anti / left-semi hash
  * join — the same key-only-payload economics as [[Joins]]' semi/anti
  * surface, one shuffle per side, no row multiplication. The distinct
  * happens DISTRIBUTED before the join, so duplicate-heavy inputs
  * collapse early and the join ships unique keys only.
  */
object SetOps {

  private def hiValueUsers(spark: SparkSession, dir: String,
                           eventType: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === eventType && col("value") > 95)
      .select(col("user_id")).distinct()

  /** High-value clickers who never made a high-value purchase. */
  def exceptCohort(spark: SparkSession, dir: String): DataFrame =
    hiValueUsers(spark, dir, "click")
      .except(hiValueUsers(spark, dir, "purchase"))
      .presentSorted(col("user_id"))

  /** Users in BOTH high-value cohorts. */
  def intersectCohort(spark: SparkSession, dir: String): DataFrame =
    hiValueUsers(spark, dir, "click")
      .intersect(hiValueUsers(spark, dir, "purchase"))
      .presentSorted(col("user_id"))

  /** Schema-evolution union: two batches of the same logical table where
    * one predates a column — the everyday shape of a long-lived parquet
    * corpus. `unionByName(allowMissingColumns = true)` aligns columns BY
    * NAME and null-fills the missing one (positional `union` would
    * silently misalign or reject); the null-ness then flows through
    * downstream logic, here surfaced via the ordered output. */
  def unionEvolution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val withValue = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("event_type"), col("value"))
    val legacy = ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("event_type"))
    withValue.unionByName(legacy, allowMissingColumns = true)
      .presentSorted(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_except"      -> exceptCohort _,
    "set_intersect"   -> intersectCohort _,
    "union_evolution" -> unionEvolution _)

  val oracles: Map[String, String] = Map(
    "set_except" ->
      """SELECT DISTINCT user_id FROM events
        |WHERE event_type = 'click' AND value > 95
        |EXCEPT
        |SELECT user_id FROM events
        |WHERE event_type = 'purchase' AND value > 95
        |ORDER BY user_id""".stripMargin,
    "set_intersect" ->
      """SELECT DISTINCT user_id FROM events
        |WHERE event_type = 'click' AND value > 95
        |INTERSECT
        |SELECT user_id FROM events
        |WHERE event_type = 'purchase' AND value > 95
        |ORDER BY user_id""".stripMargin,
    "union_evolution" ->
      """SELECT event_id, event_type, value FROM events WHERE event_id % 2 = 0
        |UNION ALL BY NAME
        |SELECT event_id, event_type FROM events WHERE event_id % 2 = 1
        |ORDER BY event_id""".stripMargin)
}
