package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Array higher-order functions — C13/C14 of SURVEY.md §2.
  *
  * The reference extracts per-level bid/ask prices with `transform` and
  * reduces them to best bid/ask with `aggregate` folds seeded by
  * ±Double.MaxValue sentinels (reference: data_processor.py:125-134).
  * Both are Catalyst built-ins (`ArrayTransform`, `ArrayAggregate`) that
  * stay inside whole-stage codegen — no UDFs, no shuffle.
  *
  * The reference has a latent bug: an EMPTY bidAskQuote array leaks the
  * ±1.7976931348623157e308 sentinel into best_bid/best_ask (no guard).
  * We expose BOTH semantics: `*_sentinel` (bug-compatible) and `*_guarded`
  * (array_max/array_min → NULL on empty), per SURVEY.md §7.5.4.
  */
object Arrays {

  private val DblMax = 1.7976931348623157e308

  /** Deterministic two-level quote book per event row (empty for 'error'
    * rows so the empty-array path is exercised at the correctness gate). */
  private def quotes: Column = {
    val v = col("value")
    when(col("event_type") === "error", array().cast(ArrayType(Schema)))
      .otherwise(array(
        struct((v * 0.999).as("bidP"), (v * 1.001).as("askP")),
        struct((v * 0.998).as("bidP"), (v * 1.002).as("askP"))))
  }
  private val Schema = StructType(Seq(
    StructField("bidP", DoubleType), StructField("askP", DoubleType)))

  /** C13: transform(bidAskQuote, x -> x.bidP) — array-of-struct to
    * array-of-double projection (reference: data_processor.py:125-126).
    *
    * The transformed arrays are flattened to scalar rows with posexplode
    * (one row per book level; empty books contribute none) because the
    * correctness gate hash-compares cell values and cannot sort/hash raw
    * array columns. The array semantics are still what is under test: the
    * per-position values can only be right if `transform` produced the
    * right arrays in the right order. */
  def hofTransform(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("q", quotes)
      .withColumn("bid_prices", transform(col("q"), x => x.getField("bidP")))
      .withColumn("ask_prices", transform(col("q"), x => x.getField("askP")))
      .select(col("event_id"), size(col("q")).as("depth"),
              posexplode(arrays_zip(col("bid_prices"), col("ask_prices"))))
      .select(
        col("event_id"), col("pos"),
        col("col.bid_prices").as("bid_price"),
        col("col.ask_prices").as("ask_price"),
        col("depth"))
      .presentSorted(col("event_id"), col("pos"))

  /** C14: aggregate folds with the reference's sentinel seeds, plus the
    * guarded array_max/array_min variants (reference:
    * data_processor.py:128-134). */
  def hofFoldBest(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("q", quotes)
      .withColumn("bid_prices", transform(col("q"), _.getField("bidP")))
      .withColumn("ask_prices", transform(col("q"), _.getField("askP")))
      .select(
        col("event_id"),
        aggregate(col("bid_prices"), lit(-DblMax),
                  (acc, x) => when(acc > x, acc).otherwise(x))
          .as("best_bid_sentinel"),
        aggregate(col("ask_prices"), lit(DblMax),
                  (acc, x) => when(acc < x, acc).otherwise(x))
          .as("best_ask_sentinel"),
        array_max(col("bid_prices")).as("best_bid_guarded"),
        array_min(col("ask_prices")).as("best_ask_guarded"))
      .presentSorted(col("event_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hof_transform" -> hofTransform _,
    "hof_fold_best" -> hofFoldBest _)

  val oracles: Map[String, String] = Map(
    "hof_transform" ->
      """SELECT event_id, 0 AS pos,
        |  value * CAST(0.999 AS DOUBLE) AS bid_price,
        |  value * CAST(1.001 AS DOUBLE) AS ask_price,
        |  2 AS depth
        |FROM events WHERE event_type <> 'error'
        |UNION ALL
        |SELECT event_id, 1,
        |  value * CAST(0.998 AS DOUBLE), value * CAST(1.002 AS DOUBLE), 2
        |FROM events WHERE event_type <> 'error'
        |ORDER BY event_id, pos""".stripMargin,
    "hof_fold_best" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'error' THEN -1.7976931348623157e308
        |       ELSE greatest(value * CAST(0.999 AS DOUBLE), value * CAST(0.998 AS DOUBLE)) END AS best_bid_sentinel,
        |  CASE WHEN event_type = 'error' THEN 1.7976931348623157e308
        |       ELSE least(value * CAST(1.001 AS DOUBLE), value * CAST(1.002 AS DOUBLE)) END AS best_ask_sentinel,
        |  CASE WHEN event_type = 'error' THEN NULL
        |       ELSE greatest(value * CAST(0.999 AS DOUBLE), value * CAST(0.998 AS DOUBLE)) END AS best_bid_guarded,
        |  CASE WHEN event_type = 'error' THEN NULL
        |       ELSE least(value * CAST(1.001 AS DOUBLE), value * CAST(1.002 AS DOUBLE)) END AS best_ask_guarded
        |FROM events ORDER BY event_id""".stripMargin)
}
