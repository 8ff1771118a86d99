package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Eval-set decontamination — flag training documents whose word
  * 3-grams overlap a held-out benchmark set. The hygiene pass every
  * serious pretraining pipeline runs (and every eval audit asks for):
  * a benchmark question leaking into the training mix inflates scores
  * silently, so contaminated docs are dropped or quarantined BEFORE
  * training, keyed by exactly this overlap evidence.
  *
  * Scale shape: the benchmark side is always SMALL (an eval suite is
  * thousands of items, the corpus is billions), so its exploded shingle
  * set is `broadcast()` — the 100 TB corpus side streams through a
  * broadcast-hash join on the shingle and never shuffles its text; the
  * only exchange is the per-doc aggregation of MATCHED shingles, which
  * is O(overlap), not O(corpus). Shingles reuse [[Dedup]]'s word
  * 3-gram builder (materialized-toks form — linear per row), so dedup
  * and decontamination agree on what "overlap" means.
  *
  * The gate takes doc_id % 97 == 3 as the benchmark stand-in; a real
  * deployment passes the eval corpus as the second table. The
  * contamination threshold (≥ 5 shared distinct 3-grams) mirrors the
  * n-gram-window rules in published decontamination setups (e.g. the
  * 8-gram/13-gram windows of GPT-3/PaLM reports, scaled to this
  * corpus's short docs).
  */
object Decontam {

  private[ext] val BenchMod = 97L
  private[ext] val BenchRem = 3L
  private[ext] val Threshold = 5L

  /** Per-corpus-doc overlap evidence against the benchmark docs:
    * distinct shared 3-grams, how many benchmark docs are touched, the
    * smallest touched benchmark id, and the threshold flag. Docs with
    * zero overlap are absent (inner join) — the common case at scale,
    * which is what keeps the aggregation small. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    contaminationFrame(spark, dir).presentSorted(col("doc_id"))

  /** Frame-level core of [[decontaminate]], unsorted — composable
    * mid-plan ([[Funnel.corpusFunnel]] joins it as one stage flag).
    * Only docs with ≥ 1 shared shingle appear; absent = clean. */
  private[ext] def contaminationFrame(spark: SparkSession,
                                      dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Dedup.shingles).as("shingle"))
    val bench = sh.filter(col("doc_id") % BenchMod === BenchRem)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    sh.filter(col("doc_id") % BenchMod =!= BenchRem)
      .join(broadcast(bench), "shingle")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("shared_shingles"),
           countDistinct(col("bench_id")).as("n_bench_docs"),
           min(col("bench_id")).as("first_bench_id"))
      .withColumn("contaminated",
                  when(col("shared_shingles") >= Threshold, 1).otherwise(0)
                    .cast(IntegerType))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontaminate" -> decontaminate _)

  val oracles: Map[String, String] = Map(
    "decontaminate" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    unnest(CASE WHEN len(string_split(text, ' ')) >= 3
         |                THEN ${Dedup.shingleSql}
         |                ELSE [] END) AS shingle
         |  FROM documents),
         |b AS (SELECT doc_id AS bench_id, shingle FROM sh
         |      WHERE doc_id % $BenchMod = $BenchRem),
         |c AS (SELECT doc_id, shingle FROM sh
         |      WHERE doc_id % $BenchMod <> $BenchRem)
         |SELECT c.doc_id,
         |  CAST(count(DISTINCT c.shingle) AS BIGINT) AS shared_shingles,
         |  CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs,
         |  min(b.bench_id) AS first_bench_id,
         |  CAST(CASE WHEN count(DISTINCT c.shingle) >= $Threshold
         |            THEN 1 ELSE 0 END AS INTEGER) AS contaminated
         |FROM c JOIN b ON c.shingle = b.shingle
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
