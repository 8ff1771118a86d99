package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** The corpus DATASHEET ("datasheets for datasets", Gebru et al. 2021;
  * every released pretraining corpus ships one): per-(lang, source)
  * composition and quality statistics — document/token counts, average
  * length, Gopher-rule pass rate, exact-duplicate rate, mean
  * classifier score. One row per cell, every metric an INTEGER (counts,
  * or ×10⁶ fixed-point via integer `DIV`) so the hash gate never sees a
  * float — even the classifier stub's score stays in its integer-ppm
  * form instead of the gate query's /1e6 double.
  *
  * Plan shape: the flags are the same corpus-global doc_id-keyed
  * columns [[Funnel.corpusFunnel]] composes (digest keeper counts,
  * Gopher pass), and ALL metrics for ALL cells ride one aggregation —
  * the [[graft.ops.Quality]] dq_checks economics: k metrics per cell
  * as conditional aggregates, never a job per metric. Exchanges: one
  * O(distinct digests) for the dup counts, one O(docs) for the gopher
  * flag join, one O(cells) for the final groupBy. */
object Card {

  def corpusCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        size(split(col("text"), " ")).cast(LongType).as("wc"),
        md5(col("text")).as("digest"),
        (conv(substring(md5(col("text")), 1, 8), 16, 10).cast(LongType)
          % 1000000L).as("score_ppm"))
    val dupCounts = docs.groupBy(col("digest"))
      .agg(count(lit(1)).as("nc"))
    val gopher = Text.gopherFlags(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("pass"))
    docs
      .join(dupCounts, "digest")
      .join(gopher, "doc_id")
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("wc")).as("n_tokens"),
        expr("(sum(wc) * 1000000L) DIV count(1)").as("avg_tokens_e6"),
        expr("(sum(CASE WHEN pass = 1 THEN 1L ELSE 0L END) * 1000000L)" +
             " DIV count(1)").as("gopher_pass_ppm"),
        expr("(sum(CASE WHEN nc > 1 THEN 1L ELSE 0L END) * 1000000L)" +
             " DIV count(1)").as("exact_dup_ppm"),
        expr("sum(score_ppm) DIV count(1)").as("mean_score_ppm"))
      .presentSorted(col("lang"), col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_card" -> corpusCard _)

  val oracles: Map[String, String] = Map(
    // `//` is DuckDB's integer division — the exact twin of Spark's
    // DIV, so no float ever enters a published metric
    "corpus_card" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
         |    md5(text) AS digest,
         |    ('0x' || substr(md5(text), 1, 8))::BIGINT % 1000000
         |      AS score_ppm
         |  FROM documents),
         |dc AS (SELECT digest, count(*) AS nc FROM d GROUP BY 1),
         |g AS (${Text.gopherPassSql})
         |SELECT d.lang, d.source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(d.wc) AS BIGINT) AS n_tokens,
         |  CAST(sum(d.wc) * 1000000 // count(*) AS BIGINT) AS avg_tokens_e6,
         |  CAST(sum(CASE WHEN g.pass = 1 THEN 1 ELSE 0 END) * 1000000
         |       // count(*) AS BIGINT) AS gopher_pass_ppm,
         |  CAST(sum(CASE WHEN dc.nc > 1 THEN 1 ELSE 0 END) * 1000000
         |       // count(*) AS BIGINT) AS exact_dup_ppm,
         |  CAST(sum(d.score_ppm) // count(*) AS BIGINT) AS mean_score_ppm
         |FROM d JOIN dc ON dc.digest = d.digest
         |       JOIN g ON g.doc_id = d.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
