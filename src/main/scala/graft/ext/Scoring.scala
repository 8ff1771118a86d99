package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Model-scoring seam for quality/toxicity classifiers — the
  * curation-pipeline surface where a learned filter (fasttext-style
  * quality model, toxicity head, license classifier) scores every
  * document before the keep/drop gates.
  *
  * The design mirrors [[Multimodal]]'s codec seam: no ML runtime exists
  * in this container, so THE MODEL IS A STUB — a deterministic function
  * of the text ([[fakeLogit]], clearly marked) that both engines can
  * compute, keeping the gate hash-verifiable. Everything around the stub
  * is the real deployment shape:
  *
  *  - the SCORE is a plain column: downstream threshold gates
  *    ([[qualityScore]]'s band classification) and samplers compose on it
  *    with ordinary predicates, and Catalyst pushes those predicates like
  *    any other;
  *  - the EXECUTABLE seam ([[scorePartitions]]) is partition-batched:
  *    the scorer lambda receives an ITERATOR of documents per executor
  *    partition and amortizes model setup across the batch — exactly
  *    where fasttext/ONNX plugs in (native handle opened once per
  *    partition, never per row; in PySpark the same contract is
  *    `mapInPandas`). ScoringSpec PROVES the batching with a
  *    loads-vs-rows accumulator count, and proves the seam path agrees
  *    bit-for-bit with the column path.
  *
  * 100 TB posture: scoring is a pure per-row map over the text column —
  * no shuffle, no driver round-trip; the plan stays one scan stage wide
  * open to whole-stage codegen (column path) or one mapPartitions stage
  * (seam path). A real model binary rides an executor-local file or a
  * `SparkContext.broadcast` of the weights, loaded once per partition at
  * iterator open — the handle cost the seam's contract amortizes.
  */
object Scoring {

  /** ==== THE MODEL STUB ====
    * Stands in for a classifier head's score in [0, 1): the first 8 hex
    * digits of md5(text) reduced mod 1e6, over 1e6 — deterministic,
    * uniform-ish, reproducible in DuckDB (`('0x' || substr(md5(text),
    * 1, 8))::BIGINT`). Exact-arithmetic note: the hash int and the mod
    * are integer ops, and the final /1e6 is one IEEE double division —
    * bit-identical in both engines (no exp/log, which are NOT
    * cross-engine stable). Swap for a real model inside
    * [[scorePartitions]] without touching the query shape. */
  private def fakeLogit(text: Column): Column =
    (conv(substring(md5(text), 1, 8), 16, 10).cast(LongType) % 1000000L)
      .cast(DoubleType) / 1e6

  /** Band thresholds — the standard 3-way curation gate (keep / send to
    * review / drop). On the stub's uniform scores the bands split the
    * corpus ~20/40/40; a real model's calibration replaces them. */
  private[ext] val KeepMin   = 0.8
  private[ext] val ReviewMin = 0.4

  private def bandOf(score: Column): Column =
    when(score >= KeepMin, lit("keep"))
      .when(score >= ReviewMin, lit("review"))
      .otherwise(lit("drop"))

  /** Column-path scoring over ANY frame with (doc_id, text) — batch or
    * STREAMING (pure per-row expressions, no state: ScoringSpec pins
    * that a streaming plan through this carries no StateStore). The
    * library entry a caller composes into their own pipeline. */
  def scored(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_words"),
        fakeLogit(col("text")).as("score"))
      .withColumn("band", bandOf(col("score")))

  /** Column-PRESERVING form of [[scored]]: appends score/band to the
    * input's own columns — the mid-pipeline composition shape
    * ([[Curation.curateStream]] stacks it on the Gopher flags in one
    * per-row streaming plan, where a doc_id self-join would be
    * stateful stream-stream). */
  def scoredKeeping(docs: DataFrame): DataFrame =
    docs
      .withColumn("score", fakeLogit(col("text")))
      .withColumn("band", bandOf(col("score")))

  /** Gate query: every document scored and banded — the shape a curation
    * run materializes once and filters many times. `n_words` rides along
    * as the real (non-stub) feature a reviewer sanity-checks bands
    * against. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    scored(Tables.documents(spark, dir)).presentSorted(col("doc_id"))

  /** One document as the partition-scoring path sees it. */
  case class DocRow(doc_id: Long, text: String)
  case class ScoredDoc(doc_id: Long, score: Double)

  /** ==== THE MODEL SWAP PATH, EXECUTABLE ====
    *
    * Partition-batched scoring: `scorer` runs ONCE per executor partition
    * over an iterator of documents — open the model handle at the head,
    * score the batch, never pay per-row setup. The default scorer
    * computes the SAME value as [[fakeLogit]], so ScoringSpec can assert
    * the two paths agree bit-for-bit — swapping in fasttext/ONNX changes
    * only the lambda. */
  def scorePartitions(docs: DataFrame,
      scorer: Iterator[DocRow] => Iterator[ScoredDoc] = defaultScorer)
      : org.apache.spark.sql.Dataset[ScoredDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
      .as[DocRow]
      .mapPartitions(scorer)
  }

  /** Deterministic stand-in scorer: one "model load" per partition
    * (the MessageDigest is the handle), then a per-row map — the cost
    * model a real classifier needs. */
  def defaultScorer(rows: Iterator[DocRow]): Iterator[ScoredDoc] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { r =>
      md.reset()
      val hex = md.digest(r.text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ScoredDoc(r.doc_id, (java.lang.Long.parseLong(hex.take(8), 16) % 1000000L) / 1e6)
    }
  }

  /** Score-weighted importance sampling — the DSIR/FineWeb-style step
    * downstream of [[qualityScore]]: each document is kept with
    * probability equal to its quality score, so the sampled corpus is
    * tilted toward high-quality documents WITHOUT the hard cliff of a
    * threshold gate. The coin flip is a SECOND independent hash
    * (md5 of the salted doc_id — salt "smp:" decorrelates it from the
    * score hash, and a seedable salt makes the sample reproducible
    * run-to-run and engine-to-engine, unlike rand()). Keep rule:
    * u < score, both exact doubles in both engines. Per-row map, no
    * shuffle; at 100 TB the sample is decided at scan time and
    * everything downstream reads only survivors. */
  def scoreWeightedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), fakeLogit(col("text")).as("score"))
      .withColumn("u",
        (conv(substring(md5(concat(lit("smp:"), col("doc_id").cast(StringType))),
              1, 8), 16, 10).cast(LongType) % 1000000L).cast(DoubleType) / 1e6)
      .filter(col("u") < col("score"))
      .presentSorted(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_score"         -> qualityScore _,
    "score_weighted_sample" -> scoreWeightedSample _)

  val oracles: Map[String, String] = Map(
    "quality_score" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |    CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 1000000
         |         AS DOUBLE) / 1e6 AS score
         |  FROM documents)
         |SELECT doc_id, n_words, score,
         |  CASE WHEN score >= $KeepMin THEN 'keep'
         |       WHEN score >= $ReviewMin THEN 'review'
         |       ELSE 'drop' END AS band
         |FROM s ORDER BY doc_id""".stripMargin,
    "score_weighted_sample" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 1000000
        |         AS DOUBLE) / 1e6 AS score,
        |    CAST(('0x' || substr(md5('smp:' || doc_id), 1, 8))::BIGINT % 1000000
        |         AS DOUBLE) / 1e6 AS u
        |  FROM documents)
        |SELECT doc_id, score, u FROM s WHERE u < score ORDER BY doc_id""".stripMargin)
}
