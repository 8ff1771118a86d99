package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Present.PresentOps

/** CDC merge (SCD type-1 upsert-with-tombstones) — the batch op that
  * folds a changelog into a snapshot: for every key keep the HIGHEST-
  * version row across base ∪ changes, and drop the key entirely when
  * that row is a delete marker. This is the kernel inside every
  * `MERGE INTO` / Delta-style upsert compaction; expressed Spark-first
  * it is one union + one row_number window, i.e. a SINGLE hash exchange
  * on the merge key — no join, no per-key driver work, nothing that
  * breaks at 100 TB. (A join-based merge shuffles base AND changes;
  * the union-window form shuffles the same bytes but plans one
  * exchange and one sort, and AQE still splits a hot key.)
  *
  * Tombstone semantics: a delete must WIN at its version like any other
  * write (drop-deletes-first would resurrect an older base row), so
  * deletes ride the same window and the filter happens after ranking.
  * Production keeps tombstones until every older snapshot fragment is
  * compacted past them; this op is that compaction.
  */
object Cdc {

  /** Fold `changes` into `base`: both carry `keys`, a total per-key
    * `ordering` (highest wins), and an `isDelete` marker column. */
  def cdcMerge(base: DataFrame, changes: DataFrame, keys: Seq[String],
               ordering: Seq[Column], isDelete: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    base.unionByName(changes)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !isDelete)
      .drop("__rn")
  }

  private val Cutoff = "2024-01-16"

  /** Gate query: the `events` stream read as a per-user profile
    * changelog — every event upserts the user's `value`, an `error`
    * event is a tombstone. Base = the pre-[[Cutoff]] half, changes =
    * the rest; version order is (ts, event_id) descending. A user whose
    * newest event is an error has been deleted and must be absent. */
  def cdcMergeQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
              col("event_type"), col("value"))
    val base    = ev.filter(col("ts") <  lit(Cutoff).cast("timestamp_ntz"))
    val changes = ev.filter(col("ts") >= lit(Cutoff).cast("timestamp_ntz"))
    cdcMerge(base, changes, Seq("user_id"),
             Seq(col("ts").desc, col("event_id").desc),
             col("event_type") === "error")
      .select(col("user_id"), col("ts").as("ver_ts"),
              col("value").as("latest_value"))
      .presentSorted(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_merge" -> cdcMergeQuery _)

  val oracles: Map[String, String] = Map(
    "cdc_merge" ->
      """WITH ranked AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, ts AS ver_ts, value AS latest_value
        |FROM ranked WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin)
}
