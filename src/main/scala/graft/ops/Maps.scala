package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Map-typed column operators — C6-C8 of SURVEY.md §2 in dedicated form
  * (they are also exercised in context by graft.ops.Parse).
  *
  * All three are per-row generators/expressions: explode multiplies rows
  * locally inside the scan's stage (no shuffle), map_keys/element_at are
  * codegen'd scalar expressions.
  */
object Maps {

  /** Two-entry instrument→price map per event. */
  private def feedsMap = map(
    col("event_type"), col("value"),
    concat(col("event_type"), lit("_alt")), col("value") * 2)

  /** C6: explode MAP → (key, value), one row per map entry
    * (reference: data_processor.py:91). */
  def mapExplode(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), explode(feedsMap).as(Seq("instrument", "price")))
      .presentSorted(col("event_id"), col("instrument"))

  /** C7: map_keys + array index — first instrument id of the feeds map
    * (reference: tick_to_hdfs.py:47). */
  def mapKeysFirst(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
              element_at(map_keys(feedsMap), 1).as("instrument"))
      .presentSorted(col("event_id"))

  /** C8: map lookup subscripted by a COLUMN, not a literal
    * (reference: tick_to_hdfs.py:48). */
  def mapLookup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
              element_at(feedsMap, col("event_type")).as("price"))
      .presentSorted(col("event_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "map_explode"    -> mapExplode _,
    "map_keys_first" -> mapKeysFirst _,
    "map_lookup"     -> mapLookup _)

  val oracles: Map[String, String] = Map(
    "map_explode" ->
      """SELECT event_id, instrument, price FROM (
        |  SELECT event_id, event_type AS instrument, value AS price FROM events
        |  UNION ALL
        |  SELECT event_id, event_type || '_alt', value * 2 FROM events)
        |ORDER BY event_id, instrument""".stripMargin,
    "map_keys_first" ->
      "SELECT event_id, event_type AS instrument FROM events ORDER BY event_id",
    "map_lookup" ->
      """SELECT event_id, event_type, value AS price
        |FROM events ORDER BY event_id""".stripMargin)
}
