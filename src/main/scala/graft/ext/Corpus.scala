package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Composed corpus hygiene — the first-pass clean a training-data
  * pipeline actually runs as ONE plan, proving the extension operators
  * compose: exact dedup (keep the lowest doc_id per content digest,
  * carrying the copy count) → quality gate (word count / type-token
  * ratio bands, the [[Text.textStats]] score) → kept docs with their
  * stats.
  *
  * Scale shape: a single hash shuffle on the digest (the dedup window —
  * same exchange a groupBy would need), then per-row expressions; the
  * quality filter runs AFTER dedup so the expensive text stats are
  * computed once per distinct document, not per copy.
  */
object Corpus {

  def corpusClean(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("digest"))
    val toks = split(col("text"), " ")
    val wc   = size(toks)
    val kept = Tables.documents(spark, dir)
      .withColumn("digest", md5(col("text")))
      .withColumn("rn", row_number().over(w.orderBy(col("doc_id"))))
      .withColumn("n_copies", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"), col("digest"), col("n_copies"),
        wc.cast(LongType).as("word_count"),
        (size(array_distinct(toks)).cast(DoubleType) / wc).as("ttr"))
      .withColumn("quality_score",
        when(col("word_count") >= 40 && col("ttr") >= 0.3, lit(1.0))
          .otherwise(when(col("word_count") >= 15, lit(0.5))
          .otherwise(lit(0.0))))
    kept
      .filter(col("quality_score") >= 0.5)
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_clean" -> corpusClean _)

  val oracles: Map[String, String] = Map(
    "corpus_clean" ->
      """WITH d AS (SELECT *, md5(text) AS digest FROM documents),
        |k AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn,
        |    count(*) OVER (PARTITION BY digest) AS n_copies
        |  FROM d),
        |t AS (
        |  SELECT doc_id, digest, n_copies, string_split(text, ' ') AS toks
        |  FROM k WHERE rn = 1),
        |s AS (
        |  SELECT doc_id, digest, n_copies,
        |    CAST(len(toks) AS BIGINT) AS word_count,
        |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM t),
        |q AS (
        |  SELECT *,
        |    CASE WHEN word_count >= 40 AND ttr >= 0.3 THEN 1.0
        |         WHEN word_count >= 15 THEN 0.5 ELSE 0.0 END AS quality_score
        |  FROM s)
        |SELECT * FROM q WHERE quality_score >= 0.5 ORDER BY doc_id""".stripMargin)
}
