package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Corpus-curation operators a crawl-scale training pipeline runs between
  * cleaning and mixing: per-domain document caps, first-capture temporal
  * dedup, and co-occurrence (PMI) statistics.
  *
  * The reference has no curation surface (its pipeline is market ticks,
  * /root/reference/data_processor.py); these extend the engine the same
  * way the dedup/similarity families do — every operator is a declarative
  * plan whose only exchanges are the key shuffles an aggregation of the
  * same keys would need anyway.
  */
object Curation {

  /** Per-domain document caps — the crawl-curation step that stops one
    * giant domain from dominating a corpus: keep at most `cap` documents
    * per `source`, preferring longer documents (`n_chars` DESC, `doc_id`
    * tiebreak so the keep-set is deterministic).
    *
    * Scale shape: a naive `row_number() OVER (PARTITION BY source)`
    * funnels every row of the biggest domain through ONE task — exactly
    * the skew that breaks at crawl scale, where a single host can be 1%
    * of the corpus. So the cap runs in TWO stages, the classic top-k
    * decomposition: stage 1 ranks within (source, salt) — 8-way split of
    * every domain — and keeps `cap` per split, shrinking any domain to
    * ≤ 8·cap rows no matter how large; stage 2 re-ranks the survivors
    * within source and keeps the true top `cap`. Correct because rank
    * filters are monotone: every global top-`cap` row is inside its
    * salt's top-`cap`. The oracle states the single-window definition;
    * equality proves the decomposition lossless.
    */
  def domainCaps(spark: SparkSession, dir: String, cap: Int = 30): DataFrame = {
    val order = Seq(col("n_chars").desc, col("doc_id").asc)
    val local = Window.partitionBy(col("source"), pmod(col("doc_id"), lit(8)))
      .orderBy(order: _*)
    val global = Window.partitionBy(col("source")).orderBy(order: _*)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rn_local", row_number().over(local))
      .filter(col("rn_local") <= cap)
      .withColumn("rnk", row_number().over(global).cast(LongType))
      .filter(col("rnk") <= cap)
      .select(col("doc_id"), col("source"), col("n_chars"), col("rnk"))
      .presentSorted(col("source"), col("rnk"))
  }

  /** First-capture temporal dedup — incremental-crawl semantics: the same
    * content (here keyed by the full `(event_type, props)` payload
    * digest) may be re-captured on every crawl pass; the EARLIEST capture
    * wins and later ones are dropped, so re-crawling never churns the
    * kept set. Differs from [[Corpus.corpusClean]]'s exact dedup in the
    * keep rule: time order, not minimum id — the rule that makes the
    * operator idempotent under append-only reprocessing.
    *
    * One hash exchange on the digest (same as the groupBy it replaces);
    * `n_dupes` rides the identical window for free. Tie on `ts` breaks by
    * `event_id` so replays are deterministic. The streaming twin is
    * [[graft.stream.IngestDedup]] (watermark-bounded state).
    */
  def keepFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("digest"))
    Tables.events(spark, dir)
      .withColumn("digest",
        md5(concat_ws("|", col("event_type"), col("props"))))
      .withColumn("rn", row_number().over(w.orderBy(col("ts"), col("event_id"))))
      .withColumn("n_dupes", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
              col("n_dupes"))
      .presentSorted(col("event_id"))
  }

  /** Adjacent-bigram co-occurrence counts — the integer INGREDIENTS of
    * pointwise mutual information (collocation mining / tokenizer-merge
    * candidates): for every bigram seen ≥ `minPair` times, its count plus
    * both unigram counts. PMI itself is
    * `log(pair_n · T / (n1 · n2))` (T = total tokens) — a per-row
    * expression downstream; the gate emits only the exact integers so the
    * hash compare never sees a float.
    *
    * Scale shape: bigrams build per-row from ATTRIBUTE `toks` (the
    * [[Text.textRepetition]] materialization rule — a lambda over the raw
    * `split()` re-runs the split per element); counts are explode →
    * partial agg, so shuffled bytes are O(distinct bigrams), not
    * O(tokens). The `minPair` filter lands BEFORE the unigram joins, and
    * the unigram side is a vocabulary (sub-linear in corpus size) —
    * broadcast on both probes, so the pair table never shuffles again.
    */
  def termPmi(spark: SparkSession, dir: String, minPair: Int = 25): DataFrame = {
    val t = col("toks")
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(t) >= 2)
    val pairs = docs
      .select(
        explode(transform(sequence(lit(1), size(t) - 1),
          i => struct(element_at(t, i).as("w1"),
                      element_at(t, i + 1).as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPair)
    // The vocabulary is probed TWICE (n1, n2) — materialize it once or
    // Spark re-reads and re-tokenizes the whole corpus per probe (the
    // shared-subplan recompute Dedup.dedupMinhashLsh documents as its
    // single most expensive regression). An eager localCheckpoint, NOT a
    // persist: a persisted frame this function can never unpersist (its
    // consumers live in the returned plan) would sit in the CacheManager
    // for the session's lifetime — the r12-flagged leak — while
    // checkpoint blocks are reclaimed by the ContextCleaner when the
    // frame is dropped. O(vocabulary) rows, sub-linear in corpus size;
    // still exactly one corpus pass (the checkpoint job).
    val uni = docs.select(explode(t).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    pairs
      .join(broadcast(uni.select(col("w").as("w1"), col("n").as("n1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("n").as("n2"))), "w2")
      .select(col("w1"), col("w2"), col("pair_n"), col("n1"), col("n2"))
      .presentSorted(col("pair_n").desc, col("w1"), col("w2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "domain_caps"      -> ((s, d) => domainCaps(s, d)),
    "dedup_keep_first" -> keepFirst _,
    "term_pmi"         -> ((s, d) => termPmi(s, d)))

  val oracles: Map[String, String] = Map(
    "domain_caps" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS rnk
        |  FROM documents)
        |SELECT doc_id, source, n_chars, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 30 ORDER BY source, rnk""".stripMargin,
    "dedup_keep_first" ->
      """WITH k AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
        |    md5(concat_ws('|', event_type, props)) AS digest
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY digest ORDER BY ts, event_id) AS rn,
        |    CAST(count(*) OVER (PARTITION BY digest) AS BIGINT) AS n_dupes
        |  FROM k)
        |SELECT event_id, ts, user_id, event_type, n_dupes
        |FROM r WHERE rn = 1 ORDER BY event_id""".stripMargin,
    // DuckDB rejects unnest() in a SELECT that also aggregates ("UNNEST
    // not supported here"), so every unnest lives in its own subquery
    // and the GROUP BY runs one level up (r10 gate failure; the rewrite
    // was verified to return exactly Spark's 718 rows at sf0.01).
    "term_pmi" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t)),
        |pc AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n
        |  FROM bg GROUP BY w1, w2 HAVING count(*) >= 25),
        |uni AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1)
        |SELECT pc.w1, pc.w2, pc.pair_n, a.n AS n1, b.n AS n2
        |FROM pc JOIN uni a ON a.w = pc.w1 JOIN uni b ON b.w = pc.w2
        |ORDER BY pair_n DESC, w1, w2""".stripMargin)
}
