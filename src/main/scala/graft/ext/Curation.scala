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

  /** Chunk width (words) for [[paragraphDedup]] — the stand-in for a
    * paragraph boundary on this newline-free synthetic corpus; a real
    * crawl splits on blank lines instead and the plan is unchanged. */
  private val ParaW = 20

  /** Paragraph-level exact dedup across the corpus (the CCNet/Dolma
    * passage-dedup pass): split every document into [[ParaW]]-word
    * chunks, keep only the FIRST corpus-order occurrence of each
    * distinct chunk, and reassemble each document from its surviving
    * chunks — boilerplate repeated across documents (cookie banners,
    * navigation, license headers) disappears while the hosting documents
    * survive.
    *
    * Scale shape, chosen deliberately AGAINST the window-by-digest form
    * [[Corpus.corpusClean]] uses for whole documents: boilerplate chunks
    * are EXACTLY the skewed keys at crawl scale (the same banner appears
    * 10⁹ times), and `row_number() OVER (PARTITION BY digest)` would
    * funnel every copy of the hottest chunk through one task. Instead
    * the keeper is a MIN-AGGREGATE of the packed (doc_id, chunk_idx)
    * order key per digest — partial aggregation collapses the hot key
    * map-side, so the exchange carries O(distinct chunks) rows — joined
    * back digest-keyed (AQE skew-split handles the residual probe-side
    * hot keys; the build side is one row per digest by construction).
    * Reassembly is one doc_id exchange: collect kept (idx, chunk)
    * structs, array_sort, concat — deterministic because (doc_id,
    * chunk_idx) is unique. Order-key packing bound: chunk_idx < 10⁶
    * (a 20-million-word document) before doc_id·10⁶ collides.
    */
  def paragraphDedup(spark: SparkSession, dir: String,
                     paraW: Int = ParaW): DataFrame = {
    val t = col("toks")
    // the chunk frame feeds BOTH the keeper aggregate and the join
    // probe side — pin it so the scan + split + explode + md5 pipeline
    // (the dominant per-row cost) runs once, not per plan reference
    // (CacheScope-ledgered; Bench/Verify release between queries)
    val chunks = graft.CacheScope.pin(
      Tables.documents(spark, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), ceil(size(t) / lit(paraW.toDouble)).cast(LongType) - 1),
            i => concat_ws(" ", slice(t, (i * paraW + 1).cast(IntegerType), lit(paraW)))))
            .as(Seq("chunk_idx", "chunk")))
        .withColumn("key", col("doc_id") * 1000000L + col("chunk_idx"))
        .withColumn("digest", md5(col("chunk"))))
    val keepers = chunks.groupBy(col("digest")).agg(min(col("key")).as("keep_key"))
    chunks.join(keepers, "digest")
      .withColumn("kept", (col("key") === col("keep_key")).cast(IntegerType))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("kept")).cast(LongType).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("kept") === 1,
            struct(col("chunk_idx"), col("chunk"))))),
          s => s.getField("chunk"))).as("dedup_text"))
      .presentSorted(col("doc_id"))
  }

  /** Sliding-window width (words) for [[substrDupSpans]] — the stand-in
    * for ExactSubstr's 50-BPE-token threshold, scaled to this corpus's
    * ~54-word documents so duplicated spans exist at test SF. */
  private val SpanW = 8

  /** The pinned window-digest frame (doc_id, n_tokens, pos, digest) +
    * the cross-doc duplicated digest set — shared by the span REPORT
    * ([[substrDupSpans]]) and the span REMOVAL ([[substrDedupApply]]).
    * Digests come from the native one-walk expression
    * (functions/WordWindowMd5.scala — same values as the composed
    * split→transform→md5(concat_ws(slice)) chain, parity pinned by
    * WordWindowMd5Spec; a short doc's empty array posexplodes to
    * nothing, so no explicit length filter is needed). Duplicated
    * windows = digests in ≥ 2 DISTINCT docs, via the two-level
    * aggregation that collapses boilerplate digests map-side twice. */
  private def spanGramsAndDups(spark: SparkSession, dir: String,
                               w: Int): (DataFrame, DataFrame) = {
    val grams = graft.CacheScope.pin(
      Tables.spreadForCpu( // the window-md5 walk is the dominant per-row
        Tables.documents(spark, dir), col("doc_id")) // cost; one split at
        .select(col("doc_id"),                       // test SF (r22)
          (size(split(col("text"), " "))).cast(LongType).as("n_tokens"),
          posexplode(graft.functions.WordWindowMd5(col("text"), lit(w)))
            .as(Seq("pos", "digest"))))
    val dupDigests = grams.select(col("digest"), col("doc_id")).distinct()
      .groupBy(col("digest")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("digest"))
    (grams, dupDigests)
  }

  /** Exact duplicated-SUBSTRING span statistics (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * ExactSubstr family): for every document, find the maximal token
    * spans whose every [[SpanW]]-token window also appears in at least
    * one OTHER document, and report per-doc coverage. Where
    * [[paragraphDedup]] removes duplicate FIXED chunks, ExactSubstr
    * detects duplication at arbitrary alignment — the form that catches
    * quotes, syndicated fragments, and templated text whose boundaries
    * do not land on chunk edges. (The paper removes the spans; this
    * operator reports them — span REMOVAL is [[paragraphDedup]]'s
    * reassembly step applied to the same marks.)
    *
    * Spark-first shape — a suffix array is a single-machine data
    * structure; the distributed equivalent is windows-as-keys:
    *  1. slide a width-[[SpanW]] stride-1 window over each token array
    *     (one codegen'd transform + posexplode, no UDF) and digest it;
    *  2. duplicated windows = digests seen in ≥ 2 DISTINCT docs — a
    *     two-level aggregation (groupBy (digest, doc) then groupBy
    *     digest) so the boilerplate digest that appears 10⁹ times at
    *     crawl scale collapses map-side BOTH times, never a
    *     count(DISTINCT) expand and never a digest window;
    *  3. join the marks back digest-keyed (build side is ≤ one row per
    *     distinct digest; AQE splits residual probe-side hot keys);
    *  4. per-doc span merge WITHOUT a lag window: sorted dup-start
    *     array, then the interval-union identity for equal-width
    *     windows — |union| = W + Σ min(W, sᵢ₊₁ − sᵢ), spans =
    *     1 + #{gaps > W} — as codegen'd array HOFs. One doc_id
    *     exchange carrying only dup positions; per-doc state is
    *     bounded by document length, the same per-row bound every
    *     text operator here already carries.
    *
    * Output is integer-only (the [[termPmi]] hash-gate practice):
    * coverage is floor-ppm, never a raw double.
    */
  def substrDupSpans(spark: SparkSession, dir: String,
                     w: Int = SpanW): DataFrame = {
    val (grams, dupDigests) = spanGramsAndDups(spark, dir, w)
    val starts = col("starts")
    val diffs = zip_with(
      slice(starts, lit(1), size(starts) - 1),
      slice(starts, lit(2), size(starts) - 1),
      (a, b) => b - a)
    grams.join(dupDigests, "digest")
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("dup_windows"),
        array_sort(collect_list(col("pos"))).as("starts"))
      .withColumn("dup_tokens",
        (lit(w) + aggregate(diffs, lit(0),
          (acc, d) => acc + least(d, lit(w)))).cast(LongType))
      .withColumn("n_spans",
        (lit(1) + aggregate(diffs, lit(0),
          (acc, d) => acc + when(d > w, 1).otherwise(0))).cast(LongType))
      .select(col("doc_id"), col("n_tokens"), col("dup_windows"),
        col("n_spans"), col("dup_tokens"),
        floor(col("dup_tokens") * lit(1000000L) / col("n_tokens"))
          .cast(LongType).as("dup_ppm"))
      .presentSorted(col("doc_id"))
  }

  /** Exact duplicated-substring REMOVAL — the APPLY step of
    * [[substrDupSpans]]'s report (Lee et al. 2022 remove the spans;
    * the report marks them): every token covered by ANY cross-doc
    * duplicated [[SpanW]]-window is dropped and the document is
    * reassembled from the survivors — the conservative boilerplate cut
    * (quotes, syndicated fragments, templated text) that keeps the
    * document itself.
    *
    * Scale shape — fully exploded, never per-row quadratic: covered
    * positions come from one generator over the marked windows
    * (DISTINCT collapses the ~W× overlap of adjacent windows
    * map-side), tokens from one generator over the texts, and the cut
    * is a doc+position LEFT-ANTI equi-join — O(tokens) rows through
    * one doc_id-keyed exchange. (The per-row alternative — an
    * `exists` HOF per token over the start array — is O(len²) on a
    * heavily-duplicated document; the anti-join is linear and AQE
    * handles a skewed mega-doc.) Reassembly is [[paragraphDedup]]'s
    * collect-sort-concat, deterministic because (doc_id, idx) is
    * unique; the gate hashes the cleaned text. */
  def substrDedupApply(spark: SparkSession, dir: String,
                       w: Int = SpanW): DataFrame = {
    val (grams, dupDigests) = spanGramsAndDups(spark, dir, w)
    val covered = grams.join(dupDigests, "digest")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(w - 1))).as("idx"))
      .distinct()
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("idx", "tok")))
    val kept = toks.join(covered, Seq("doc_id", "idx"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("idx"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
          .as("removed_tokens"),
        md5(coalesce(col("clean_text"), lit(""))).as("clean_md5"))
      .presentSorted(col("doc_id"))
  }

  /** Streaming-stateless curation kernel — "clean the crawl as it
    * lands": Gopher quality rules ([[Text.gopherFlags]]) and the
    * classifier band gate ([[Scoring.scoredKeeping]]) stacked as ONE
    * per-row pipeline over (doc_id, text, ...). Deliberately NO join
    * and NO aggregate: a doc_id self-join in a stream is stateful
    * stream-stream, and this kernel must run identically in batch and
    * inside a micro-batch ([[graft.stream.CurationPipeline]] — the
    * CdcApply batch-kernel pattern). Survivors = Gopher pass ∧ band ≠
    * drop, with the flag/score columns carried for downstream
    * accounting. CurationStreamSpec pins batch/stream bit-parity and
    * the StateStore-free plan. */
  def curateStream(docs: DataFrame): DataFrame =
    Scoring.scoredKeeping(Text.gopherFlags(docs))
      .filter(col("pass") === 1 && col("band") =!= "drop")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "domain_caps"       -> ((s, d) => domainCaps(s, d)),
    "dedup_keep_first"  -> keepFirst _,
    "term_pmi"          -> ((s, d) => termPmi(s, d)),
    "paragraph_dedup"   -> ((s, d) => paragraphDedup(s, d)),
    "dedup_substr_spans" -> ((s, d) => substrDupSpans(s, d)),
    "substr_dedup_apply" -> ((s, d) => substrDedupApply(s, d)))

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
        |ORDER BY pair_n DESC, w1, w2""".stripMargin,
    "paragraph_dedup" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |c AS (
         |  SELECT doc_id, i AS chunk_idx,
         |    array_to_string(toks[(i * $ParaW + 1):(i * $ParaW + $ParaW)], ' ')
         |      AS chunk,
         |    doc_id * 1000000 + i AS key
         |  FROM t, unnest(range(0, CAST(ceil(len(toks) / $ParaW.0) AS BIGINT)))
         |         AS u(i)),
         |k AS (SELECT md5(chunk) AS digest, min(key) AS keep_key
         |      FROM c GROUP BY 1),
         |j AS (
         |  SELECT c.*, CAST(c.key = k.keep_key AS INTEGER) AS kept
         |  FROM c JOIN k ON md5(c.chunk) = k.digest)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(kept) AS BIGINT) AS n_kept,
         |  COALESCE(array_to_string(list_transform(
         |    list({'chunk_idx': chunk_idx, 'chunk': chunk} ORDER BY chunk_idx)
         |      FILTER (WHERE kept = 1),
         |    s -> struct_extract(s, 'chunk')), ' '), '') AS dedup_text
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Span-merge identity restated with a lag window (DuckDB has no
    // cheap sorted-array fold); Spark deliberately avoids the window —
    // equality of the two forms is part of what the gate proves. Spark
    // positions are 0-based, DuckDB's 1-based: differences (all the
    // output uses) are identical.
    "dedup_substr_spans" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, len(toks) AS n_tokens, i AS pos,
         |    md5(array_to_string(toks[i:i + $SpanW - 1], ' ')) AS digest
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - $SpanW + 2)) AS i
         |        FROM t WHERE len(toks) >= $SpanW)),
         |dd AS (
         |  SELECT digest FROM (SELECT DISTINCT digest, doc_id FROM g)
         |  GROUP BY digest HAVING count(*) >= 2),
         |m AS (
         |  SELECT g.doc_id, g.n_tokens, g.pos,
         |    lag(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS prev
         |  FROM g JOIN dd USING (digest))
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS dup_windows,
         |  CAST(sum(CASE WHEN prev IS NULL OR pos - prev > $SpanW
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN prev IS NULL THEN $SpanW
         |           ELSE least($SpanW, pos - prev) END) AS BIGINT) AS dup_tokens,
         |  CAST(floor(sum(CASE WHEN prev IS NULL THEN $SpanW
         |                 ELSE least($SpanW, pos - prev) END)
         |             * 1000000.0 / n_tokens) AS BIGINT) AS dup_ppm
         |FROM m GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin,
    "substr_dedup_apply" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, i AS pos,
         |    md5(array_to_string(toks[i:i + $SpanW - 1], ' ')) AS digest
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - $SpanW + 2)) AS i
         |        FROM t WHERE len(toks) >= $SpanW)),
         |dd AS (
         |  SELECT digest FROM (SELECT DISTINCT digest, doc_id FROM g)
         |  GROUP BY digest HAVING count(*) >= 2),
         |cov AS (
         |  SELECT DISTINCT g.doc_id, g.pos + u.o AS idx
         |  FROM g JOIN dd USING (digest)
         |       CROSS JOIN (SELECT unnest(range(0, $SpanW)) AS o) u),
         |tok AS (
         |  SELECT doc_id, i AS idx, toks[i] AS tok
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
         |        FROM t)),
         |kept AS (
         |  SELECT tok.doc_id, tok.idx, tok.tok
         |  FROM tok LEFT JOIN cov ON cov.doc_id = tok.doc_id
         |                        AND cov.idx = tok.idx
         |  WHERE cov.doc_id IS NULL),
         |a AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
         |    array_to_string(list_transform(
         |      list({'idx': idx, 'tok': tok} ORDER BY idx),
         |      s -> struct_extract(s, 'tok')), ' ') AS clean_text
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.kept_tokens, 0) AS BIGINT) AS kept_tokens,
         |  CAST(len(string_split(d.text, ' ')) - coalesce(a.kept_tokens, 0)
         |       AS BIGINT) AS removed_tokens,
         |  md5(coalesce(a.clean_text, '')) AS clean_md5
         |FROM documents d LEFT JOIN a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin)
}
