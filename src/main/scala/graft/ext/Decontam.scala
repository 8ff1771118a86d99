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
                                      dir: String): DataFrame =
    contaminationFromShingles(
      Tables.spreadForCpu( // tokenize+shingle across cores on a
        Tables.documents(spark, dir), col("doc_id")) // single-split scan
        .select(col("doc_id"), explode(Dedup.shingles).as("shingle")))

  /** [[contaminationFrame]] over a caller-supplied exploded shingle
    * frame (doc_id, shingle) — the seam that lets [[Funnel]] feed this
    * probe from the SAME pinned shingle pass the LSH stage already pays
    * for (guide §2.3), instead of re-tokenizing the corpus. Shingle
    * values must be [[Dedup.shingles]]' (the funnel passes
    * `explode(ss)` of [[Dedup.pinnedShingles]] — the identical native
    * expression, so the overlap evidence cannot drift). */
  private[ext] def contaminationFromShingles(sh: DataFrame): DataFrame = {
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

  /** Cosine threshold for [[decontaminateEmb]]. On this synthetic
    * embedding space cosines are diffuse (cross-set maxima ≈ 0.45), so
    * the threshold is calibrated to the fixture the same way
    * [[Dedup.dedupEmbedding]]'s is — the MECHANICS (max-cosine probe,
    * argmax tiebreak, threshold flag), not the absolute value, are what
    * the gate verifies (the [[Text.langId]] precedent). A production
    * run sets it from a held-out near-dup ROC, typically ≥ 0.9. */
  private[ext] val EmbTau = 0.35

  /** Embedding-space eval decontamination — the SEMANTIC complement of
    * the n-gram [[decontaminate]]: a paraphrased eval question shares
    * no 3-gram but sits next to the benchmark item in embedding space.
    * Same held-out convention (vec_id ≡ [[BenchRem]] mod [[BenchMod]]
    * plays the external eval set).
    *
    * Scale shape is [[Similarity.knnBrute]]'s: the eval set is SMALL
    * (thousands of items) and rides broadcast; the corpus streams
    * through the crossJoin without ever shuffling its vectors, and the
    * per-vector max collapses map-side (partial agg), so the only
    * exchange carries O(corpus) 3-column rows. For an eval set too big
    * to broadcast, swap the candidate generation for the IVF cell
    * probe ([[Similarity.knnIvf]]) — flag shape unchanged. Output is
    * integer ppm (the [[Curation.termPmi]] hash-gate practice); the
    * raw-double threshold compare happens before quantization,
    * identically in both engines. */
  def decontaminateEmb(spark: SparkSession, dir: String,
                       tau: Double = EmbTau): DataFrame = {
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
    val bench = v.filter(col("vec_id") % BenchMod === BenchRem)
      .select(col("vec_id").as("bid"), col("v").as("bv"))
    graft.Present.sorted(
      v.filter(col("vec_id") % BenchMod =!= BenchRem)
        .crossJoin(broadcast(bench))
        .withColumn("cosine", Vectors.cosine(col("v"), col("bv")))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cosine"), (-col("bid")).as("nb"))).as("best"))
        .select(col("vec_id"),
          floor(col("best.cosine") * lit(1000000L)).cast(LongType)
            .as("max_cos_ppm"),
          (-col("best.nb")).as("nearest_bench"),
          (col("best.cosine") >= tau).cast(IntegerType).as("contaminated")),
      col("vec_id"))
  }

  /** Window width and eval-set split for [[decontaminateSubstr]].
    * The width matches [[Curation.substrDupSpans]]'s SpanW; the split
    * is denser than [[BenchMod]]'s (eval suites are a few percent of a
    * corpus, and the overlap witness needs real hits at gate SF). */
  private[ext] val SubW = 8
  private[ext] val SubMod = 13L
  private[ext] val SubRem = 3L

  /** EXACT-SUBSTRING eval decontamination (the Lee et al. 2022 /
    * frontier-lab form of [[decontaminate]]): a training doc is
    * contaminated if any stride-1 [[SubW]]-token window appears
    * verbatim in the held-out set — catching long quoted spans that
    * the distinct-shingle OVERLAP COUNT threshold can under-weigh and
    * paraphrase-level embedding distance ([[decontaminateEmb]]) can
    * miss. Together the three ops are the decontamination ladder a
    * production eval audit runs: n-gram overlap, exact span, semantic.
    *
    * Window digests come from the native one-walk
    * [[graft.functions.WordWindowMd5]] (no token arrays, no gram
    * strings); the eval side collapses to one row per DISTINCT digest
    * (min bench doc) BEFORE the join — broadcast O(eval windows) —
    * so the corpus side streams through an equi-join and a per-doc
    * partial-agg exchange of O(contaminated docs). Output lists only
    * contaminated docs (the [[decontaminate]] convention: absent =
    * clean). */
  def decontaminateSubstr(spark: SparkSession, dir: String,
                          w: Int = SubW): DataFrame = {
    val g = graft.CacheScope.pin(
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          explode(graft.functions.WordWindowMd5(col("text"), lit(w)))
            .as("digest")))
    val bench = g.filter(col("doc_id") % SubMod === SubRem)
      .groupBy(col("digest")).agg(min(col("doc_id")).as("first_bench_id"))
    g.filter(col("doc_id") % SubMod =!= SubRem)
      .join(broadcast(bench), "digest")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("digest")).as("shared_windows"),
           min(col("first_bench_id")).as("first_bench_id"))
      .presentSorted(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontaminate" -> decontaminate _,
    "decontaminate_emb" -> ((s, d) => decontaminateEmb(s, d)),
    "decontaminate_substr" -> ((s, d) => decontaminateSubstr(s, d)))

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
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "decontaminate_substr" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    md5(array_to_string(toks[i:i + $SubW - 1], ' ')) AS digest
         |  FROM (SELECT doc_id, toks,
         |          unnest(range(1, len(toks) - $SubW + 2)) AS i
         |        FROM t WHERE len(toks) >= $SubW)),
         |b AS (SELECT digest, min(doc_id) AS first_bench_id
         |      FROM g WHERE doc_id % $SubMod = $SubRem GROUP BY 1)
         |SELECT g.doc_id,
         |  CAST(count(DISTINCT g.digest) AS BIGINT) AS shared_windows,
         |  min(b.first_bench_id) AS first_bench_id
         |FROM g JOIN b USING (digest)
         |WHERE g.doc_id % $SubMod <> $SubRem
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "decontaminate_emb" ->
      s"""WITH v AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |b AS (SELECT vec_id AS bid, v AS bv FROM v
         |      WHERE vec_id % $BenchMod = $BenchRem),
         |c AS (SELECT vec_id, v FROM v WHERE vec_id % $BenchMod <> $BenchRem),
         |s AS (
         |  SELECT c.vec_id, b.bid,
         |    ${Similarity.cosineSqlOf("c.v", "b.bv")} AS cosine
         |  FROM c CROSS JOIN b),
         |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |              ORDER BY cosine DESC, bid) AS rn FROM s)
         |SELECT vec_id,
         |  CAST(floor(cosine * 1000000) AS BIGINT) AS max_cos_ppm,
         |  bid AS nearest_bench,
         |  CAST(cosine >= $EmbTau AS INTEGER) AS contaminated
         |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin)
}
