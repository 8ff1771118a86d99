package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** N-gram language-model perplexity scoring — the CCNet-style corpus
  * quality pass (Wenzek et al. 2020: score every document under a
  * KenLM 5-gram model, bucket the corpus into head/middle/tail by
  * per-language perplexity percentiles; the head bucket is what
  * LLM pretraining keeps). No reference-repo counterpart — this is
  * the training-data-pipeline surface (BASELINE.json north_star).
  *
  * This is the whole pipeline expressed as ONE declarative plan:
  * train (add-one-smoothed conditional bigram model — the in-engine
  * stand-in for the external KenLM artifact), score (mean negative
  * log-likelihood per document), bucket (corpus tertiles).
  * A production run swaps the self-trained model for a table trained
  * on a reference corpus via [[trainBigramModel]] + [[scoreWith]]
  * (CCNet uses Wikipedia) — the scoring join is the same plan, which
  * is the point of keeping the model a DataFrame instead of a
  * driver-side object; LangModelSpec round-trips the artifact through
  * parquet and pins the OOV smoothing path.
  *
  * Scale shape, piece by piece:
  *   - The bigram frame feeds BOTH the model build and the scoring
  *     join, so it is pinned ([[graft.CacheScope]]-ledgered) — one
  *     corpus scan + tokenize + explode, not one per consumer (the
  *     shared-subplan recompute [[Dedup.dedupMinhashLsh]] documents
  *     as its most expensive regression).
  *   - Model size is VOCABULARY economics, not corpus economics:
  *     `big` is O(distinct bigrams), sub-linear in corpus size, and it
  *     is the ONLY model artifact — the smoothing denominator is the
  *     CONTEXT count c(w1·) = Σ_w2 c(w1,w2) (the proper conditional
  *     form) and the vocab size is |w1 ∪ w2|, both derived FROM the
  *     checkpointed bigram table in O(distinct bigrams), so the corpus
  *     is tokenized exactly once. `big` joins under
  *     [[Dedup.pinBuildSide]]'s rule (broadcast under the 4M-row
  *     driver ceiling [[Dedup.MaxBroadcastRows]], distributed
  *     SHUFFLE_HASH above it — a web-scale bigram table can exceed a
  *     broadcast), inlined here so the count that makes the decision
  *     is also the pin's materialization job; the O(vocab) context
  *     frame and the 1-row vocab count are unconditionally broadcast.
  *   - Scoring is explode → broadcast-join → groupBy(doc_id): partial
  *     aggregation collapses each document's log-prob terms map-side,
  *     so the only exchange carries O(documents) partial rows, never
  *     O(tokens).
  *   - Bucket thresholds are exact `percentile_disc` over the O(docs)
  *     score frame (actual data values — the [[graft.ops.Quality]]
  *     winsorize pattern; at 100 TB swap in approx_percentile's
  *     mergeable t-digest, same plan shape), cross-joined back as a
  *     broadcast 1-row frame — never a driver collect.
  *
  * Measured cost (sf0.1, 32 threads): min ≈ 1.75 s steady-state over
  * 6–8 reps with the monotone-decaying rep profile BASELINE.md's
  * "Iterative-query rep noise" note attributes to JIT tier-up — the
  * same class as dedup_substr_spans (1.75 s): two passes over the
  * pinned O(tokens) pair frame (model build, scoring join) plus the
  * O(docs) percentile/bucket tail. Sharing one pin for the model
  * table (vs localCheckpoint + a second pin) and pinning `scored`
  * were each measured; the floor is the two pair-frame passes.
  *
  * Hash-gate determinism: the score is quantized to integer ppm
  * (floor of mean-NLL × 10⁶) INSIDE the query, so thresholds,
  * comparisons and the gate hash all run on integers — the [[termPmi]]
  * practice. The only floats are the per-bigram `ln` terms; a 1-ulp
  * libm or summation-order divergence vs the oracle is ~10⁻⁸ relative,
  * which cannot move a floor(×10⁶) except on an exact boundary.
  * Documents with <2 tokens have no bigrams and are excluded (the
  * [[graft.ext.Curation.termPmi]] convention).
  */
object LangModel {

  /** Tertile fractions, shared verbatim with the oracle SQL so both
    * engines parse the IDENTICAL double literal. */
  private val Q1 = 1.0 / 3
  private val Q2 = 2.0 / 3

  def lmPerplexity(spark: SparkSession, dir: String): DataFrame =
    scoreFrame(Tables.documents(spark, dir))

  /** (doc_id, w1, w2) per token position — one O(tokens) frame from a
    * (doc_id, text) frame; docs with <2 tokens drop here. */
  private def pairsOf(in: DataFrame): DataFrame = {
    val t = col("toks")
    // spread the tokenize+explode across cores when the input arrives as
    // fewer splits than the machine has (the [[Dedup.shingleSets]] rule;
    // conditional, so a production-scale scan skips the shuffle) —
    // measured r22: the whole O(tokens) pair pass ran as ONE 0.42 s task
    // at sf0.1 because the documents parquet is a single split. Row
    // order changes only; every consumer is an order-free aggregate or
    // equi-join (the ppm quantization makes even the fp sums exact).
    Tables.spreadForCpu(in, col("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(t) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(t) - 1),
          i => struct(element_at(t, i).as("w1"),
                      element_at(t, i + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
  }

  /** Train the model artifact: bigram counts (w1, w2, pair_n) from a
    * (doc_id, text) reference corpus. This is the table a production
    * run persists once (CCNet trains on Wikipedia) and [[scoreWith]]
    * probes forever after; LangModelSpec round-trips it through
    * parquet the way a per-snapshot job would. */
  def trainBigramModel(in: DataFrame): DataFrame =
    pairsOf(in).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("pair_n"))

  /** Score `in` under an EXTERNAL bigram model table. Unseen bigrams
    * and contexts are smoothed, not dropped: the scoring join is
    * LEFT-outer with c = 0 / c(w1·) = 0 defaults, so an OOV bigram
    * costs ln(1/V) under the model's vocabulary — without this, an
    * external model would silently skip exactly the n-grams that make
    * a document out-of-domain. (On the self-trained path every bigram
    * matches, so left ≡ inner and the gate values are unchanged.) */
  def scoreWith(in: DataFrame, model: DataFrame): DataFrame =
    bucketGlobal(scoreCore(graft.CacheScope.pin(pairsOf(in)), model))

  /** Scores WITHOUT bucketing: (doc_id, n_bigrams, nll_ppm). The
    * production increment path — bucket thresholds are a corpus-level
    * decision made once per snapshot, while scoring is per-document
    * and embarrassingly incremental: this form runs unchanged inside a
    * streaming `foreachBatch` against the persisted model artifact
    * (LangModelSpec pins batch/stream parity), the [[graft.stream
    * .CdcApply]] batch-kernel pattern. */
  def scoreDocs(in: DataFrame, model: DataFrame): DataFrame =
    scoreCore(graft.CacheScope.pin(pairsOf(in)), model)

  /** Frame-level self-trained form: `in` needs (doc_id, text). The one
    * pinned pair frame feeds BOTH the model build and the scoring
    * probe — a single corpus tokenize pass. */
  def scoreFrame(in: DataFrame): DataFrame =
    bucketGlobal(scoreCore(selfTrainedScored(in)))

  /** Pinned pair frame + self-trained model from it, pre-composed for
    * [[scoreFrame]]/[[lmPerplexityByLang]]. */
  private def selfTrainedScored(in: DataFrame): (DataFrame, DataFrame) = {
    val pairs = graft.CacheScope.pin(pairsOf(in))
    (pairs,
     pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("pair_n")))
  }

  private def scoreCore(pm: (DataFrame, DataFrame)): DataFrame =
    scoreCore(pm._1, pm._2)

  private def scoreCore(pairs: DataFrame, model: DataFrame): DataFrame = {
    // the model table — probed three times (scoring join, context
    // denominators, vocab count): ONE pin, whose count doubles as the
    // materialization job AND the [[Dedup.MaxBroadcastRows]] driver-
    // safety check (pinBuildSide's rule, inlined so ctx/vocab reuse the
    // same cached partitions instead of paying a second materialization)
    val big = graft.CacheScope.pin(model)
    val bigSide =
      if (big.count() <= Dedup.MaxBroadcastRows) broadcast(big)
      else big.hint("shuffle_hash")
    // c(w1·) and |V| in O(distinct bigrams) — never a second corpus pass
    val ctx = big.groupBy(col("w1")).agg(sum(col("pair_n")).as("n1"))
    val vocab = big.select(col("w1").as("w"))
      .union(big.select(col("w2")))
      .agg(count_distinct(col("w")).as("v")) // 1 row — never a collect
    // O(documents) rows, but its SUBPLAN is the expensive one (the
    // O(tokens) scoring join) and it feeds BOTH the tertile bounds and
    // the final bucket select — pin, or the join runs twice
    val scored = graft.CacheScope.pin(
      pairs
        .join(bigSide, Seq("w1", "w2"), "left")
        .join(broadcast(ctx), Seq("w1"), "left")
        .crossJoin(broadcast(vocab))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
             // add-one bigram log-prob: ln((c(w1w2)+1) / (c(w1·)+V));
             // OOV rows smooth through the coalesced zeros. Each ln
             // term quantizes to ppm LONGs BEFORE the sum — Spark's
             // partial-agg order varies run-to-run, and a float sum's
             // 1-ulp wobble on the later floor boundary would flake
             // the gate; the long sum is exact and order-independent
             // (the KMeans/Pq fixed-point discipline). Residual
             // cross-engine surface: the single per-term floor(ln·10⁶).
             sum(floor(log((coalesce(col("pair_n"), lit(0L)) + lit(1.0)) /
                           (coalesce(col("n1"), lit(0L)) + col("v"))) *
                       lit(1000000L)).cast(LongType))
               .as("ll_ppm"))
        .select(col("doc_id"), col("n_bigrams"),
          floor((-col("ll_ppm")).cast(DoubleType) / col("n_bigrams"))
            .cast(LongType).as("nll_ppm")))
    scored
  }

  /** Corpus-global tertile bucketing over a scored frame. */
  private def bucketGlobal(scored: DataFrame): DataFrame =
    bucketGlobalFrame(scored).presentSorted(col("doc_id"))

  /** Unsorted form of [[bucketGlobal]] — composable mid-plan
    * ([[Funnel.corpusFunnel]]'s perplexity stage flag). */
  private[ext] def bucketGlobalFrame(scored: DataFrame): DataFrame = {
    val bounds = scored.agg(
      expr(s"percentile_disc($Q1) WITHIN GROUP (ORDER BY nll_ppm)").as("q1"),
      expr(s"percentile_disc($Q2) WITHIN GROUP (ORDER BY nll_ppm)").as("q2"))
    scored
      .crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("n_bigrams"), col("nll_ppm"),
        bucketCol.as("bucket"))
  }

  /** Self-trained scored+bucketed frame for composition (unsorted). */
  private[ext] def bucketsOf(in: DataFrame): DataFrame =
    bucketGlobalFrame(scoreCore(selfTrainedScored(in)))

  /** EXTERNAL-model scored+bucketed frame for composition (unsorted):
    * `in` scores under a frozen `model` artifact with OOV smoothing
    * ([[scoreWith]]'s left-join semantics); tertile bounds come from
    * the scored frame itself — per-increment bounds, the snapshot-
    * local form of CCNet's percentiles. [[Funnel.incrementalFunnel]]'s
    * history-model perplexity stage. */
  private[ext] def bucketsWith(in: DataFrame, model: DataFrame): DataFrame =
    bucketGlobalFrame(scoreCore(graft.CacheScope.pin(pairsOf(in)), model))

  /** Global tertile-bounds SQL over the `s` CTE from
    * [[ScoredCtesBody]] — shared with [[Funnel]]'s oracle. */
  private[ext] val BoundsSql: String =
    s"SELECT quantile_disc(nll_ppm, $Q1) AS q1, " +
    s"quantile_disc(nll_ppm, $Q2) AS q2 FROM s"

  private def bucketCol =
    when(col("nll_ppm") <= col("q1"), lit("head"))
      .when(col("nll_ppm") <= col("q2"), lit("middle"))
      .otherwise(lit("tail"))

  /** CCNet's actual bucketing scope: percentiles are PER LANGUAGE
    * (Wenzek et al. 2020 §4.3 — a global threshold would dump every
    * low-resource language into `tail` because the model fits the
    * majority language better). Same scored frame; the tertile bounds
    * group by `lang` (O(languages) rows, broadcast back), so the only
    * extra plan work over [[lmPerplexity]] is the O(docs) lang
    * join — the same scale as the scoring exchange itself. */
  def lmPerplexityByLang(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = scoreCore(selfTrainedScored(docs))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val bounds = scored.groupBy(col("lang")).agg(
      expr(s"percentile_disc($Q1) WITHIN GROUP (ORDER BY nll_ppm)").as("q1"),
      expr(s"percentile_disc($Q2) WITHIN GROUP (ORDER BY nll_ppm)").as("q2"))
    scored
      .join(broadcast(bounds), "lang")
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("nll_ppm"),
        bucketCol.as("bucket"))
      .presentSorted(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lm_perplexity" -> lmPerplexity _,
    "lm_perplexity_lang" -> lmPerplexityByLang _)

  /** Shared oracle prefix: DuckDB spelling of the same model — bigrams
    * via the proven term_pmi unnest(range) idiom, ln == Spark's natural
    * log — ending at the scored frame `s`. Both bucketing oracles
    * append their own bounds. */
  private[ext] val ScoredCtesBody: String =
      s"""t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |  WHERE len(string_split(text, ' ')) >= 2),
         |bg AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t)),
         |pc AS (SELECT w1, w2, count(*) AS pair_n FROM bg GROUP BY 1, 2),
         |ctx AS (SELECT w1, CAST(sum(pair_n) AS BIGINT) AS n1
         |        FROM pc GROUP BY 1),
         |v AS (SELECT count(DISTINCT w) AS v
         |      FROM (SELECT w1 AS w FROM pc UNION ALL SELECT w2 FROM pc)),
         |s AS (
         |  SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(floor(-CAST(sum(CAST(floor(
         |                 ln((pc.pair_n + 1.0) / (ctx.n1 + v.v)) * 1000000)
         |               AS BIGINT)) AS DOUBLE)
         |               / count(*)) AS BIGINT) AS nll_ppm
         |  FROM bg
         |  JOIN pc ON pc.w1 = bg.w1 AND pc.w2 = bg.w2
         |  JOIN ctx ON ctx.w1 = bg.w1
         |  CROSS JOIN v
         |  GROUP BY bg.doc_id)""".stripMargin

  /** Split-trained oracle CTEs for [[bucketsWith]]: the model trains
    * on `trainPred` documents, `scorePred` documents score under it
    * with the LEFT-join OOV smoothing [[scoreWith]] defines (coalesced
    * zero counts → ln(1/V) per unseen bigram), ending at the scored
    * frame `s` — [[BoundsSql]] composes on top unchanged. Same ppm
    * per-term quantization as [[ScoredCtesBody]]. */
  private[ext] def splitScoredCtes(trainPred: String,
                                   scorePred: String): String =
    s"""tt AS (
       |  SELECT string_split(text, ' ') AS toks FROM documents
       |  WHERE ($trainPred) AND len(string_split(text, ' ')) >= 2),
       |tbg AS (
       |  SELECT toks[i] AS w1, toks[i + 1] AS w2
       |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM tt)),
       |pc AS (SELECT w1, w2, count(*) AS pair_n FROM tbg GROUP BY 1, 2),
       |ctx AS (SELECT w1, CAST(sum(pair_n) AS BIGINT) AS n1
       |        FROM pc GROUP BY 1),
       |v AS (SELECT count(DISTINCT w) AS v
       |      FROM (SELECT w1 AS w FROM pc UNION ALL SELECT w2 FROM pc)),
       |qt AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |  WHERE ($scorePred) AND len(string_split(text, ' ')) >= 2),
       |qbg AS (
       |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
       |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
       |        FROM qt)),
       |s AS (
       |  SELECT qbg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(floor(-CAST(sum(CAST(floor(
       |                 ln((coalesce(pc.pair_n, 0) + 1.0)
       |                    / (coalesce(ctx.n1, 0) + v.v)) * 1000000)
       |               AS BIGINT)) AS DOUBLE)
       |               / count(*)) AS BIGINT) AS nll_ppm
       |  FROM qbg
       |  LEFT JOIN pc ON pc.w1 = qbg.w1 AND pc.w2 = qbg.w2
       |  LEFT JOIN ctx ON ctx.w1 = qbg.w1
       |  CROSS JOIN v
       |  GROUP BY qbg.doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "lm_perplexity" ->
      s"""WITH $ScoredCtesBody,
         |b AS (SELECT quantile_disc(nll_ppm, $Q1) AS q1,
         |             quantile_disc(nll_ppm, $Q2) AS q2 FROM s)
         |SELECT doc_id, n_bigrams, nll_ppm,
         |  CASE WHEN nll_ppm <= b.q1 THEN 'head'
         |       WHEN nll_ppm <= b.q2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM s CROSS JOIN b ORDER BY doc_id""".stripMargin,
    "lm_perplexity_lang" ->
      s"""WITH $ScoredCtesBody,
         |sl AS (SELECT s.*, d.lang FROM s
         |       JOIN documents d ON d.doc_id = s.doc_id),
         |b AS (SELECT lang, quantile_disc(nll_ppm, $Q1) AS q1,
         |              quantile_disc(nll_ppm, $Q2) AS q2
         |      FROM sl GROUP BY lang)
         |SELECT sl.doc_id, sl.lang, sl.n_bigrams, sl.nll_ppm,
         |  CASE WHEN sl.nll_ppm <= b.q1 THEN 'head'
         |       WHEN sl.nll_ppm <= b.q2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM sl JOIN b ON b.lang = sl.lang ORDER BY sl.doc_id""".stripMargin)
}
