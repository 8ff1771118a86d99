package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

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
      .presentSorted(col("doc_id"))
  }

  /** Stratified subsample: a deterministic per-stratum quota (50 docs per
    * `lang`), "randomized" by ranking on the md5 of the id — a seedable,
    * engine-independent shuffle both Spark and DuckDB reproduce exactly,
    * unlike rand(). One hash exchange on the stratum key; the quota
    * filter is a rank predicate, so only quota rows survive the window —
    * the standard class-balancing step before training. */
  def stratifiedSample(spark: SparkSession, dir: String,
                       quota: Int = 50): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota)
      .presentSorted(col("doc_id"))
  }

  /** Deterministic train/validation/test assignment by content-stable
    * hash: bucket = first 4 md5 hex digits of the id mod 100 → 80/10/10.
    * Hash-based (not rand()) so the split is REPRODUCIBLE and stable
    * under corpus growth — a doc keeps its split forever, the property
    * leakage audits depend on. Pure per-row expression: no shuffle at
    * all until the ORDER BY. */
  def trainTestSplit(spark: SparkSession, dir: String,
                     trainPct: Int = 80, validationPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && validationPct >= 0 && trainPct + validationPct < 100,
      s"percentages must be non-negative and leave room for test, " +
      s"got train=$trainPct validation=$validationPct")
    val bucket = conv(substring(md5(col("doc_id").cast(StringType)), 1, 4), 16, 10)
      .cast(IntegerType) % 100
    Tables.documents(spark, dir)
      .select(col("doc_id"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .otherwise(when(col("bucket") < trainPct + validationPct, lit("validation"))
          .otherwise(lit("test"))))
      .select(col("doc_id"), col("bucket"), col("split"))
      .presentSorted(col("doc_id"))
  }

  /** Token-budget shard packing — assign each document to a training
    * shard so contiguous docs fill ~`budget` tokens per shard: shard id
    * = ⌊(tokens before this doc) / budget⌋ over a running per-worker
    * token sum. Greedy sequential packing is inherently ordered, so it
    * parallelizes BY WORKER: each worker (at 100 TB, the ingest
    * partition id; here a stable `doc_id % workers`) packs its own slice
    * independently — one hash exchange on the worker key, one
    * in-partition sort, running-sum window. A global single-sequence
    * pack would be one worker = one sorted partition: the known
    * anti-shape this keying exists to avoid.
    *
    * Overshoot bound (by construction): a shard's token count is
    * < budget + max_doc_tokens, because a doc is assigned by its START
    * offset; docs larger than the budget own their shards. Exact
    * bin-packing is NP-hard and order-destroying — start-offset packing
    * is the standard streaming-friendly contract. */
  def packShards(spark: SparkSession, dir: String,
                 budget: Int = 2000, workers: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("worker")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % workers).as("worker"),
              size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("shard_id",
        floor((col("cum_tokens") - col("n_tokens")) / lit(budget.toDouble))
          .cast(LongType))
      .presentSorted(col("doc_id"))
  }

  /** Context-window packing-efficiency report — the accounting that
    * motivates sample packing (Raffel et al. 2020 §2.2 pack to 512;
    * GPT-3 trains on packed streams): for each candidate context
    * length, how many windows does per-document padding cost versus
    * packing documents into a continuous stream? `naive_eff` is
    * real-token fraction under pad-each-doc-to-ctx; `packed_eff` its
    * packed upper bound (⌈total/ctx⌉ windows — what [[packShards]]'
    * start-offset packing approaches to within one doc per shard
    * boundary). The gap × GPU-hours is the waste a training run pays
    * for skipping the packer; the report is how you pick ctx before
    * committing a tokenization run.
    *
    * One scan: per-doc token counts ([[Text.tokenCount]]'s BPE-ish
    * regex spelling) exploded over the O(1) ctx candidates, one
    * aggregate — integer-exact sums, ⌈·⌉ as floor over an exact
    * double division (counts ≪ 2⁵³), final ratios single IEEE
    * divisions. O(ctx candidates) output rows. */
  def packingEfficiency(spark: SparkSession, dir: String,
                        ctxs: Seq[Int] = Seq(64, 128, 256, 512)): DataFrame = {
    val nt = size(regexp_extract_all(col("text"), lit(Text.BpeTokenRe),
      lit(0))).cast(LongType)
    Tables.documents(spark, dir)
      .select(nt.as("nt"))
      .select(col("nt"),
        explode(array(ctxs.map(c => lit(c)): _*)).as("ctx"))
      .select(col("nt"), col("ctx").cast(LongType).as("ctx"),
        floor((col("nt") + col("ctx") - 1).cast(DoubleType) / col("ctx"))
          .cast(LongType).as("chunks"))
      .groupBy(col("ctx"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("nt")).as("n_tokens"),
           sum(col("chunks")).as("naive_chunks"))
      .withColumn("naive_pad_tokens",
        col("naive_chunks") * col("ctx") - col("n_tokens"))
      .withColumn("packed_chunks",
        floor((col("n_tokens") + col("ctx") - 1).cast(DoubleType) / col("ctx"))
          .cast(LongType))
      .withColumn("naive_eff",
        col("n_tokens").cast(DoubleType) / (col("naive_chunks") * col("ctx")))
      .withColumn("packed_eff",
        col("n_tokens").cast(DoubleType) / (col("packed_chunks") * col("ctx")))
      .presentSorted(col("ctx"))
  }

  /** Domain-mixture epoch weighting — materialize a training mix where
    * each language (at 100 TB: each source domain) is repeated by a
    * fractional epoch factor: en×0.5 (downsample), de×2.25, zh×3.0,
    * fr×1.0, es×1.5. The standard data-mixing step (e.g. The Pile /
    * Llama mixture tables) between cleaning and shard packing.
    *
    * Fractional epochs without rand(): copies = ⌊w⌋ plus one more iff
    * the doc's content-stable md5 bucket (same formula as
    * [[trainTestSplit]]) falls under the fractional part — so exactly
    * the target fraction of each domain gets the extra copy, the choice
    * is REPRODUCIBLE run-to-run, and a given doc always up/downsamples
    * the same way (the property mixture-ablation comparisons depend
    * on). Pure per-row expressions + explode — no shuffle at all until
    * the gate's ORDER BY; the output multiplication is the unavoidable
    * materialization cost, which is why `copy_idx` (not physically
    * copied text) is the output: downstream shard packing joins text
    * back or reads it by reference. */
  def mixtureEpochs(spark: SparkSession, dir: String): DataFrame = {
    val whole = when(col("lang") === "en", 0).when(col("lang") === "de", 2)
      .when(col("lang") === "zh", 3).when(col("lang") === "fr", 1)
      .otherwise(1)
    val fracPct = when(col("lang") === "en", 50).when(col("lang") === "de", 25)
      .when(col("lang") === "zh", 0).when(col("lang") === "fr", 0)
      .otherwise(50)
    val bucket = conv(substring(md5(col("doc_id").cast(StringType)), 1, 4), 16, 10)
      .cast(IntegerType) % 100
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
              (whole + when(bucket < fracPct, 1).otherwise(0))
                .cast(LongType).as("n_copies"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"), col("n_copies"),
              explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx"))
      .presentSorted(col("doc_id"), col("copy_idx"))
  }

  /** Temperature exponent for [[langTemperatureSample]] — shared
    * verbatim with the oracle so both engines parse the identical
    * double literal. XLM-R's published value. */
  private val TempAlpha = 0.3

  /** Temperature-based LANGUAGE resampling (Conneau et al. 2020, XLM-R
    * §3.1; also mBERT's exponent-smoothed sampling): languages are
    * drawn with q_l ∝ p_l^α, α < 1, which UPsamples low-resource
    * languages relative to their corpus share without flattening the
    * distribution entirely. Where [[mixtureEpochs]] takes a hand-tuned
    * per-domain table, this op DERIVES the repeat factor from the data:
    * w_l = q_l·N / n_l, so a language's expected post-sampling mass is
    * exactly q_l·N documents.
    *
    * Realization is [[mixtureEpochs]]'s reproducible fraction machinery
    * at basis-point granularity: copies = ⌊w_l⌋ plus one more iff the
    * doc's content-stable md5 bucket (mod 10⁴) falls under the
    * fractional part — seedable, rand()-free, and a given doc always
    * resolves the same way run-to-run. Plan shape: ONE O(languages)
    * aggregate; the per-language weights and the 1-row (N, Σp^α) stats
    * broadcast back, so the corpus itself never shuffles.
    *
    * Determinism: the Σ n_l^α normalizer is NOT summed as doubles —
    * Spark's partial-agg order varies run-to-run and a 1-ulp wobble on
    * a floor boundary would flip the gate columns. Instead each
    * language's pow term quantizes to ppm LONGs first (the repo's
    * fixed-point practice, as in KMeans/Pq), so the sum is exact and
    * order-independent; every later double op (two divides, one
    * multiply, in pinned order) is IEEE-deterministic given identical
    * operands. The only residual cross-engine surface is the single
    * per-language floor(pow·10⁶). */
  def langTemperatureSample(spark: SparkSession, dir: String,
                            alpha: Double = TempAlpha): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
      .withColumn("pa_ppm",
        floor(pow(col("n_l"), alpha) * lit(1000000d)).cast(LongType))
    val stats = counts.agg(sum(col("n_l")).as("n"),
                           sum(col("pa_ppm")).as("sa_ppm"))
    // q_l·N / n_l over the ppm terms, in the oracle's exact op order
    val wl = col("pa_ppm").cast(DoubleType) / col("sa_ppm") * col("n") / col("n_l")
    val bucket = conv(substring(md5(col("doc_id").cast(StringType)), 1, 4),
                      16, 10).cast(IntegerType) % 10000
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .join(broadcast(counts), "lang")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("lang"), col("n_l"),
        floor(wl * lit(1000000L)).cast(LongType).as("weight_ppm"),
        (floor(wl).cast(LongType) +
          when(bucket < floor((wl - floor(wl)) * 10000).cast(IntegerType),
               1L).otherwise(0L)).as("n_copies"))
      .presentSorted(col("doc_id"))
  }

  /** Length bucketing for padding-efficient batching: group docs of
    * similar token counts so fixed-shape training batches waste little
    * padding (batch cost is max-length × batch-size; mixing a 10-token
    * doc into a 2000-token bucket pays 199× padding for it). Per-worker
    * `ntile` — the same worker keying as [[packShards]] — so the sort
    * is per-partition, never global: one exchange on the worker key,
    * one in-partition sort, and each worker's slice splits into
    * `buckets` equal-count tiles. Per-doc `pad_waste` (1 − len/bucket
    * max) is the measurable the bucketing exists to minimize; summing
    * it per bucket is the padding-efficiency report. */
  def lengthBuckets(spark: SparkSession, dir: String,
                    buckets: Int = 8, workers: Int = 8): DataFrame = {
    val byLen = Window.partitionBy(col("worker"))
      .orderBy(col("n_tokens"), col("doc_id"))
    val inBucket = Window.partitionBy(col("worker"), col("bucket"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % workers).as("worker"),
              size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .withColumn("bucket", ntile(buckets).over(byLen).cast(LongType))
      .withColumn("bucket_max", max(col("n_tokens")).over(inBucket))
      .withColumn("pad_waste",
                  lit(1.0) - col("n_tokens").cast(DoubleType) / col("bucket_max"))
      .presentSorted(col("doc_id"))
  }

  /** Fixed-size token-window document chunking with overlap — the step
    * that turns cleaned documents into training sequences: windows of
    * `chunk` tokens starting every `stride` tokens (overlap = chunk −
    * stride preserves context across boundaries, the standard LM
    * packing prep). Chunk starts are `sequence(0, n_tokens−1, stride)`
    * so every token is covered and a final short window keeps the tail
    * (`chunk_tokens` < chunk only on the last window).
    *
    * Scale shape: pure per-row HOFs — split once, generate starts,
    * posexplode, slice — NO shuffle at all until the gate's ORDER BY;
    * output size is the (chunk/stride)× token multiplication inherent
    * to overlapped chunking, and `chunk_text` is materialized here only
    * because the gate hash-compares it (at 100 TB you'd emit
    * (doc_id, start, chunk_tokens) and slice lazily at read time). */
  def docChunks(spark: SparkSession, dir: String,
                chunk: Int = 32, stride: Int = 24): DataFrame = {
    require(chunk > 0 && stride > 0 && stride <= chunk,
      s"need 0 < stride <= chunk, got chunk=$chunk stride=$stride")
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
              posexplode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
                                  lit(stride))).as(Seq("chunk_id", "start")))
      .select(
        col("doc_id"), col("chunk_id").cast(LongType).as("chunk_id"),
        col("start").cast(LongType).as("start"),
        least(lit(chunk), size(col("toks")) - col("start"))
          .cast(LongType).as("chunk_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(chunk)), " ")
          .as("chunk_text"))
      .presentSorted(col("doc_id"), col("chunk_id"))
  }

  // Defaults bound here match the oracle SQL below (quota 50, 80/10/10,
  // budget 2000 / 8 workers, chunk 32 / stride 24).
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_clean"      -> corpusClean _,
    "sample_stratified" -> ((s, d) => stratifiedSample(s, d)),
    "train_test_split"  -> ((s, d) => trainTestSplit(s, d)),
    "pack_shards"       -> ((s, d) => packShards(s, d)),
    "mixture_epochs"    -> mixtureEpochs _,
    "lang_temperature_sample" -> ((s, d) => langTemperatureSample(s, d)),
    "length_buckets"    -> ((s, d) => lengthBuckets(s, d)),
    "doc_chunks"        -> ((s, d) => docChunks(s, d)),
    "packing_efficiency" -> ((s, d) => packingEfficiency(s, d)))

  val oracles: Map[String, String] = Map(
    "packing_efficiency" ->
      s"""WITH per AS (
        |  SELECT CAST(len(regexp_extract_all(text,
        |           '${Text.BpeTokenRe}')) AS BIGINT) AS nt
        |  FROM documents),
        |x AS (
        |  SELECT nt, CAST(ctx AS BIGINT) AS ctx,
        |    CAST(floor(CAST(nt + ctx - 1 AS DOUBLE) / ctx) AS BIGINT)
        |      AS chunks
        |  FROM (SELECT nt, unnest([64, 128, 256, 512]) AS ctx FROM per)),
        |a AS (
        |  SELECT ctx,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(nt) AS BIGINT) AS n_tokens,
        |    CAST(sum(chunks) AS BIGINT) AS naive_chunks
        |  FROM x GROUP BY 1),
        |b AS (
        |  SELECT ctx, n_docs, n_tokens, naive_chunks,
        |    naive_chunks * ctx - n_tokens AS naive_pad_tokens,
        |    CAST(floor(CAST(n_tokens + ctx - 1 AS DOUBLE) / ctx) AS BIGINT)
        |      AS packed_chunks
        |  FROM a)
        |SELECT ctx, n_docs, n_tokens, naive_chunks, naive_pad_tokens,
        |  packed_chunks,
        |  CAST(n_tokens AS DOUBLE) / (naive_chunks * ctx) AS naive_eff,
        |  CAST(n_tokens AS DOUBLE) / (packed_chunks * ctx) AS packed_eff
        |FROM b ORDER BY ctx""".stripMargin,
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
        |SELECT * FROM q WHERE quality_score >= 0.5 ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, rn FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 50 ORDER BY doc_id""".stripMargin,
    "pack_shards" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS worker,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *,
        |    CAST(sum(n_tokens) OVER (PARTITION BY worker ORDER BY doc_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS cum_tokens
        |  FROM t)
        |SELECT doc_id, worker, n_tokens, cum_tokens,
        |  CAST(floor((cum_tokens - n_tokens) / 2000.0) AS BIGINT) AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "length_buckets" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS worker,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT *,
        |    CAST(ntile(8) OVER (PARTITION BY worker ORDER BY n_tokens, doc_id)
        |         AS BIGINT) AS bucket
        |  FROM t),
        |m AS (
        |  SELECT *,
        |    CAST(max(n_tokens) OVER (PARTITION BY worker, bucket) AS BIGINT)
        |      AS bucket_max
        |  FROM b)
        |SELECT doc_id, worker, n_tokens, bucket, bucket_max,
        |  1.0 - CAST(n_tokens AS DOUBLE) / bucket_max AS pad_waste
        |FROM m ORDER BY doc_id""".stripMargin,
    "lang_temperature_sample" ->
      s"""WITH c AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_l
         |  FROM documents GROUP BY 1),
         |cq AS (SELECT lang, n_l,
         |         CAST(floor(pow(n_l, $TempAlpha) * 1000000) AS BIGINT) AS pa_ppm
         |       FROM c),
         |st AS (SELECT CAST(sum(n_l) AS BIGINT) AS n,
         |              CAST(sum(pa_ppm) AS BIGINT) AS sa_ppm FROM cq),
         |w AS (SELECT cq.lang, cq.n_l,
         |        CAST(cq.pa_ppm AS DOUBLE) / st.sa_ppm * st.n / cq.n_l AS wl
         |      FROM cq CROSS JOIN st)
         |SELECT d.doc_id, d.lang, w.n_l,
         |  CAST(floor(wl * 1000000) AS BIGINT) AS weight_ppm,
         |  CAST(CAST(floor(wl) AS BIGINT) +
         |    CASE WHEN
         |      ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::INTEGER
         |        % 10000
         |      < CAST(floor((wl - floor(wl)) * 10000) AS INTEGER)
         |    THEN 1 ELSE 0 END AS BIGINT) AS n_copies
         |FROM documents d JOIN w ON w.lang = d.lang
         |ORDER BY d.doc_id""".stripMargin,
    "mixture_epochs" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 2
        |                   WHEN 'zh' THEN 3 WHEN 'fr' THEN 1 ELSE 1 END
        |      + CASE WHEN
        |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100
        |          < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 25
        |                      WHEN 'zh' THEN 0 WHEN 'fr' THEN 0 ELSE 50 END
        |        THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        |  FROM documents)
        |SELECT doc_id, lang, n_copies,
        |       unnest(range(n_copies)) AS copy_idx
        |FROM d WHERE n_copies > 0 ORDER BY doc_id, copy_idx""".stripMargin,
    "doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |         unnest(range(0, greatest(len(toks), 1), 24)) AS start
        |  FROM t)
        |SELECT doc_id,
        |  CAST(start // 24 AS BIGINT) AS chunk_id,
        |  CAST(start AS BIGINT) AS start,
        |  CAST(least(32, len(toks) - start) AS BIGINT) AS chunk_tokens,
        |  array_to_string(list_slice(toks, start + 1, start + 32), ' ')
        |    AS chunk_text
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "train_test_split" ->
      """SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100
        |      AS bucket
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin)
}
