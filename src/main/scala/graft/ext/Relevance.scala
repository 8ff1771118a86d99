package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Corpus-statistics relevance ranking (TF-IDF) — the classic retrieval
  * scoring a training-data pipeline uses for keyword extraction, corpus
  * drift probes, and cheap query-relevance labels. Shares the
  * whitespace-token convention of [[Text]] (TESTDATA documents are
  * pre-normalized lowercase words).
  *
  * Scale shape at 100 TB:
  *   - term frequencies: explode → groupBy(doc, term) with map-side
  *     combine — ONE hash exchange whose shuffled bytes are
  *     O(distinct (doc, term)) not O(tokens);
  *   - document frequencies: a second partial agg OVER THE TF TABLE
  *     (never re-reading texts) — shuffled bytes O(vocabulary);
  *   - the df table joins back BROADCAST: vocabulary is orders of
  *     magnitude smaller than the corpus (if a web-scale vocab outgrows
  *     the broadcast threshold, Spark falls back to a shuffled hash
  *     join on `term` — the tf table is already keyed by term in its
  *     partitioning's suffix, and correctness is unaffected);
  *   - top-k per doc is one row_number window on the doc key.
  *
  * The corpus size N enters as a 1-row aggregate cross-joined in
  * (broadcast by construction) — never a driver-side collect.
  *
  * Output is integer-only (tf, doc_freq, rank) — the double score is
  * used for ORDERING but not emitted, so the hash gate never compares
  * cross-engine float renderings; exact score ties (equal tf and df)
  * break on the term string.
  */
object Relevance {

  def tfidfTopTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val terms = docs.select(col("doc_id"),
                            explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val n  = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * log(col("n_docs").cast(DoubleType) / col("doc_freq")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"),
              col("tf"), col("doc_freq"))
      .presentSorted(col("doc_id"), col("rank"))
  }

  // k = 3 bound in the oracle below.
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tfidf_top_terms" -> ((s, d) => tfidfTopTerms(s, d)))

  val oracles: Map[String, String] = Map(
    "tfidf_top_terms" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |df AS (
        |  SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.doc_freq,
        |         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.doc_freq) AS score
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |             ORDER BY score DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, doc_freq
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)
}
