package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Text analysis over the `documents` table — the training-data-pipeline
  * surface (BASELINE.json north_star; no reference-repo counterpart: the
  * reference's only text handling is JSON codec work, SURVEY.md §2.C).
  *
  * Every operator is per-row Catalyst expressions (split / HOFs / regexp) —
  * no UDFs, no shuffle, whole-stage codegen'd, so throughput scales
  * linearly with input splits at 100 TB.
  *
  * Tokenization convention: documents.text is single-space-separated
  * lowercase words, so `split(text, ' ')` is exact; a production corpus
  * would swap in the regexp tokenizer from [[tokenCount]].
  */
object Text {

  private val Stopwords  = Seq("the", "a", "of", "and", "to", "in")
  /** Marker sets for the lang-id heuristic (en vs non-en function words). */
  private val EnMarkers  = Seq("the", "a", "of", "and")
  private val DeMarkers  = Seq("der", "die", "das", "und")

  private def toks: Column = split(col("text"), " ")

  /** The BPE-ish pre-tokenizer regex (letter runs / digit runs / single
    * other chars) — ONE spelling shared by [[tokenCount]],
    * [[Corpus.packingEfficiency]], and both of their oracles; ASCII
    * classes both regex engines define identically. */
  private[ext] val BpeTokenRe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  private def countIn(toksCol: Column, words: Seq[String]): Column =
    size(filter(toksCol, t => t.isin(words: _*)))

  /** Quality scoring: length / token / stopword / distinct-ratio stats and
    * a banded quality score — the usual first-pass corpus filter. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val wc = size(toks)
    val sumLen = aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"), col("lang"),
        length(col("text")).cast(LongType).as("n_chars"),
        wc.cast(LongType).as("word_count"),
        size(array_distinct(toks)).cast(LongType).as("distinct_words"),
        (sumLen.cast(DoubleType) / wc).as("avg_word_len"),
        countIn(toks, Stopwords).cast(LongType).as("stopword_count"),
        (countIn(toks, Stopwords).cast(DoubleType) / wc).as("stopword_ratio"),
        (size(array_distinct(toks)).cast(DoubleType) / wc).as("ttr"))
      .withColumn("quality_score",
        when(col("word_count") >= 40 && col("ttr") >= 0.3, lit(1.0))
          .otherwise(when(col("word_count") >= 15, lit(0.5))
          .otherwise(lit(0.0))))
      .presentSorted(col("doc_id"))
  }

  /** Language-ID heuristic: function-word marker counts per language
    * family, argmax with a deterministic tie rule. (On this synthetic
    * corpus the vocabulary carries no language signal — the mechanics,
    * not the accuracy, are what the gate verifies.) */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"), col("lang"),
        countIn(toks, EnMarkers).cast(LongType).as("score_en"),
        countIn(toks, DeMarkers).cast(LongType).as("score_de"))
      .withColumn("predicted_lang",
        when(col("score_en") >= col("score_de"), lit("en")).otherwise(lit("de")))
      .withColumn("is_match", (col("predicted_lang") === col("lang")).cast(IntegerType))
      .presentSorted(col("doc_id"))

  /** Token counting: whitespace tokens plus a BPE-ish regexp pass
    * (letter runs / digit runs / single other chars — the pre-tokenizer
    * split most BPE vocabularies assume). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpeTokenRe), lit(0)))
          .cast(LongType).as("bpe_tokens"))
      .presentSorted(col("doc_id"))

  /** Document fingerprinting: min-hash over character 8-gram shingles at
    * stride 4 (the columnar form of a strided rolling-hash fingerprint —
    * half-overlapping windows cover every byte while hashing ¼ of the
    * positions) plus a whole-text digest. md5 is used because the DuckDB
    * oracle must reproduce the value bit-for-bit; swap for xxhash64 where
    * the fingerprint never leaves Spark.
    *
    * The strided min-hash is the native one-walk
    * [[graft.functions.StridedMinMd5]] expression, which replaced the
    * exploded generator→md5→hash-aggregate form (itself a fix for the
    * CodegenFallback array_min(transform(…)) trap): the fingerprint is
    * now a pure per-row PROJECTION — no generator rows, no per-window
    * substr/hex allocation, no aggregation, and therefore no exchange
    * anywhere in the plan (the exploded form needed spreadForCpu
    * hash-partitioning to keep its groupBy exchange-free;
    * StridedMinMd5Spec pins the exchange-free plan). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
              graft.functions.StridedMinMd5(col("text"), lit(8), lit(4))
                .as("shingle_fingerprint"))
      .presentSorted(col("doc_id"))

  /** Repetition-ratio quality signals (the Gopher-style repetitiousness
    * filters): duplicate-bigram fraction and top-word mass fraction per
    * document. Highly repetitive documents (boilerplate, keyword spam,
    * degenerate generations) score high on both and are dropped before
    * training.
    *
    * Two complementary plan shapes on purpose: the bigram ratio is pure
    * per-row HOFs (LINEAR in doc length — `sequence` + `element_at`,
    * never a nested filter-per-distinct-token scan, which would go
    * quadratic per row); the top-word fraction needs per-(doc, word)
    * counts, which is the classic explode → two-level partial agg — at
    * 100 TB the explode multiplies rows ~100× but partial aggregation
    * collapses them back BEFORE the doc_id shuffle, so shuffled bytes
    * stay O(distinct words), not O(tokens). The final join is doc_id
    * equi-join of two similarly-partitioned sides. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    // materialize toks/bg/counts stepwise: a lambda must index an
    // ATTRIBUTE, not the split(text) expression — inlined, the split
    // re-runs per array element (the O(words²)-per-doc trap measured in
    // Dedup's shingle build), and the distinct count is computed once,
    // not per consumer
    val t = col("toks")
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", toks)
      .filter(size(t) >= 2)
    val withBg = docs
      .withColumn("bg", transform(
        sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
      .withColumn("n_bg", size(col("bg")).cast(LongType))
      .withColumn("n_dis", size(array_distinct(col("bg"))).cast(LongType))
    val perRow = withBg.select(
      col("doc_id"),
      size(t).cast(LongType).as("word_count"),
      (col("n_bg") - col("n_dis")).as("dup_bigrams"),
      (lit(1.0) - col("n_dis").cast(DoubleType) / col("n_bg"))
        .as("dup_bigram_ratio"))
    val topWord = docs.select(col("doc_id"), explode(t).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg((max(col("n")).cast(DoubleType) / sum(col("n")))
             .as("top_word_ratio"))
    perRow.join(topWord, "doc_id").presentSorted(col("doc_id"))
  }

  /** Corpus vocabulary heavy hitters: tokens carrying ≥ `minShare` of
    * all token mass — the exact-counting form of frequent-items (vocab
    * audits, stopword discovery, tokenizer-coverage checks). Explode →
    * two-level partial agg, so shuffled bytes are O(distinct words);
    * the global-total window runs over the POST-AGGREGATE vocab frame
    * (|vocab| rows — fine single-partition even when the corpus is
    * 100 TB, because vocabulary grows sub-linearly). The approximate
    * mergeable-sketch counterpart (`df.stat.freqItems`, superset
    * guarantee) is pinned against this exact form in QualitySpec. */
  def vocabHeavyHitters(spark: SparkSession, dir: String,
                        minShare: Double = 0.01): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val total = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.unboundedFollowing)
    counts
      .withColumn("share",
                  col("n").cast(DoubleType) / sum(col("n")).over(total)
                    .cast(DoubleType))
      .filter(col("share") >= minShare)
      .presentSorted(col("n").desc, col("word"))
  }

  /** Required function words for [[gopherRules]]' stopword rule: the
    * Gopher paper's English set ("the, be, to, of, and, that, have,
    * with") EXTENDED with "a" — this synthetic vocabulary contains only
    * "the"/"a" of the originals, and without the extension the rule
    * would be vacuously false corpus-wide (the mechanics, not the
    * English calibration, are what the gate verifies). */
  private[ext] val GopherStops =
    Seq("the", "a", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Appendix A1.1) — the named rule set
    * most large-corpus curation runs start from. Each rule is a flag
    * column so downstream can tell WHICH gate a document failed (the
    * deploy shape: rules are tuned per-source by inspecting per-rule
    * fail rates, then `pass` filters):
    *
    *  - `wc_ok`: 50 ≤ word count ≤ 100,000;
    *  - `wlen_ok`: mean word length in [3, 10];
    *  - `symbol_ok`: symbol-to-word ratio ("#" / "...") ≤ 0.1;
    *  - `alpha_ok`: ≥ 80% of words contain an alphabetic character;
    *  - `stop_ok`: ≥ 2 distinct [[GopherStops]] present.
    *
    * All per-row codegen'd expressions, no shuffle — the same 100 TB
    * posture as [[textStats]] (which this complements: textStats is the
    * descriptive-stats pass, this is the named keep/drop rule set;
    * [[textRepetition]] carries the paper's OTHER half, the
    * repetitiousness rules). symbol_ok/alpha_ok pass vacuously on this
    * all-alphabetic synthetic corpus; wc/wlen/stop discriminate. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherFlags(Tables.documents(spark, dir))
      .select(col("doc_id"), col("word_count"), col("mean_word_len"),
        col("symbol_ratio"), col("alpha_word_ratio"),
        col("n_required_stops"), col("wc_ok"), col("wlen_ok"),
        col("symbol_ok"), col("alpha_ok"), col("stop_ok"), col("pass"))
      .presentSorted(col("doc_id"))

  /** Frame-level core of [[gopherRules]], unsorted and COLUMN-
    * PRESERVING: the stat/flag columns append to `in`'s own columns,
    * so the rules compose mid-pipeline (the funnels join on `pass`;
    * [[Curation.curateStream]] needs `text` to survive into the
    * classifier stage of a one-pass STREAMING plan, where a doc_id
    * self-join would be stateful stream-stream). The gate query
    * projects the flag columns back out. `in` needs (doc_id, text). */
  private[ext] def gopherFlags(in: DataFrame): DataFrame = {
    val t = col("toks")
    val wc = size(t)
    val sumLen = aggregate(transform(t, x => length(x)), lit(0), (a, x) => a + x)
    val nSym = size(filter(t, x => x.contains("#") || x.contains("...")))
    val nAlpha = size(filter(t, x => x.rlike("[a-zA-Z]")))
    val nStops = size(array_intersect(array_distinct(t),
      array(GopherStops.map(lit): _*)))
    in
      .withColumn("toks", toks)
      .withColumn("word_count", wc.cast(LongType))
      .withColumn("mean_word_len", sumLen.cast(DoubleType) / wc)
      .withColumn("symbol_ratio", nSym.cast(DoubleType) / wc)
      .withColumn("alpha_word_ratio", nAlpha.cast(DoubleType) / wc)
      .withColumn("n_required_stops", nStops.cast(LongType))
      .drop("toks")
      .withColumn("wc_ok", (col("word_count") >= 50 &&
        col("word_count") <= 100000).cast(IntegerType))
      .withColumn("wlen_ok", (col("mean_word_len") >= 3.0 &&
        col("mean_word_len") <= 10.0).cast(IntegerType))
      .withColumn("symbol_ok", (col("symbol_ratio") <= 0.1).cast(IntegerType))
      .withColumn("alpha_ok", (col("alpha_word_ratio") >= 0.8).cast(IntegerType))
      .withColumn("stop_ok", (col("n_required_stops") >= 2).cast(IntegerType))
      .withColumn("pass", (col("wc_ok") === 1 && col("wlen_ok") === 1 &&
        col("symbol_ok") === 1 && col("alpha_ok") === 1 &&
        col("stop_ok") === 1).cast(IntegerType))
  }

  /** Canonical text normalization — the step every dedup/fingerprint
    * pass runs FIRST on a raw corpus: casefold, strip everything outside
    * [a-z0-9 ], collapse whitespace runs, trim. Regex classes kept to
    * ASCII ranges both regex engines (Java here, RE2 in the oracle)
    * define identically. Pure per-row codegen'd expressions — no
    * shuffle. */
  def normalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " ")).as("norm_text"))
      .withColumn("norm_len", length(col("norm_text")).cast(LongType))
      .presentSorted(col("doc_id"))

  /** Corpus n-gram diversity — distinct-n over total-n for n = 1..3
    * (Li et al. 2016's distinct-1/distinct-2, the standard repetition/
    * degeneration metric, applied corpus-wide): a crawl slice whose
    * distinct-2 collapses is template boilerplate even when every
    * individual document passes the per-doc repetition rules
    * ([[textRepetition]] is the within-doc half; this is the
    * across-corpus half). One exploded scan over the native
    * [[graft.functions.WordWindowMd5]] digests for all three widths,
    * one aggregate; counts integer-exact, the ratio a single IEEE
    * division. O(1) output rows. */
  def ngramDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // genuinely ONE scan: all three widths' digest arrays ride one
      // exploded struct array per row (a 3-way union would read and
      // tokenize the corpus three times)
      .select(explode(array((1 to 3).map(n =>
          struct(lit(n.toLong).as("n"),
            graft.functions.WordWindowMd5(col("text"), lit(n)).as("gs"))): _*))
        .as("w"))
      .select(col("w.n").as("n"), explode(col("w.gs")).as("g"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("total_ngrams"),
           countDistinct(col("g")).as("distinct_ngrams"))
      .withColumn("distinct_ratio",
        col("distinct_ngrams").cast(DoubleType) / col("total_ngrams"))
      .presentSorted(col("n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ngram_diversity"  -> ngramDiversity _,
    "text_stats"       -> textStats _,
    "text_lang_id"     -> langId _,
    "text_token_count" -> tokenCount _,
    "text_fingerprint" -> fingerprint _,
    "text_repetition"  -> textRepetition _,
    "vocab_heavy_hitters" -> ((s, d) => vocabHeavyHitters(s, d)),
    "text_normalize"   -> normalize _,
    "gopher_rules"     -> gopherRules _)

  private def sqlList(words: Seq[String]) =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Oracle fragment: (doc_id, pass) under the SAME Gopher conditions as
    * [[gopherFlags]] — shared with [[Funnel]]'s composed oracle so the
    * two gates can never drift. */
  private[ext] val gopherPassSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN len(toks) BETWEEN 50 AND 100000
       |    AND CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
       |        / len(toks) BETWEEN 3.0 AND 10.0
       |    AND CAST(len(list_filter(toks,
       |          x -> contains(x, '#') OR contains(x, '...'))) AS DOUBLE)
       |        / len(toks) <= 0.1
       |    AND CAST(len(list_filter(toks,
       |          x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
       |        / len(toks) >= 0.8
       |    AND len(list_filter(${sqlList(GopherStops)},
       |          w -> list_contains(list_distinct(toks), w))) >= 2
       |  THEN 1 ELSE 0 END AS pass
       |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ngram_diversity" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |g AS MATERIALIZED (
        |  SELECT n, md5(array_to_string(toks[i:i + n - 1], ' ')) AS g
        |  FROM (SELECT toks, n, unnest(range(1, len(toks) - n + 2)) AS i
        |        FROM (SELECT toks, unnest([1, 2, 3]) AS n FROM t)
        |        WHERE len(toks) >= n))
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS total_ngrams,
        |  CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams,
        |  CAST(count(DISTINCT g) AS DOUBLE) / count(*) AS distinct_ratio
        |FROM g GROUP BY n ORDER BY n""".stripMargin,
    "text_stats" ->
      s"""WITH t AS (
         |  SELECT *, string_split(text, ' ') AS toks FROM documents),
         |s AS (
         |  SELECT doc_id, lang,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len(toks) AS BIGINT) AS word_count,
         |    CAST(len(list_distinct(toks)) AS BIGINT) AS distinct_words,
         |    CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
         |      / len(toks) AS avg_word_len,
         |    CAST(len(list_filter(toks, t -> list_contains(${sqlList(Stopwords)}, t))) AS BIGINT)
         |      AS stopword_count,
         |    CAST(len(list_filter(toks, t -> list_contains(${sqlList(Stopwords)}, t))) AS DOUBLE)
         |      / len(toks) AS stopword_ratio,
         |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
         |  FROM t)
         |SELECT *,
         |  CASE WHEN word_count >= 40 AND ttr >= 0.3 THEN 1.0
         |       WHEN word_count >= 15 THEN 0.5 ELSE 0.0 END AS quality_score
         |FROM s ORDER BY doc_id""".stripMargin,
    "text_lang_id" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      t -> list_contains(${sqlList(EnMarkers)}, t))) AS BIGINT) AS score_en,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      t -> list_contains(${sqlList(DeMarkers)}, t))) AS BIGINT) AS score_de
         |  FROM documents)
         |SELECT *,
         |  CASE WHEN score_en >= score_de THEN 'en' ELSE 'de' END AS predicted_lang,
         |  CAST(CASE WHEN score_en >= score_de THEN 'en' ELSE 'de' END = lang
         |       AS INTEGER) AS is_match
         |FROM t ORDER BY doc_id""".stripMargin,
    "text_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '$BpeTokenRe'))
         |       AS BIGINT) AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(text) AS text_md5,
        |  list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1, 4),
        |                          i -> md5(substr(text, CAST(i AS INTEGER), 8))))
        |    AS shingle_fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "vocab_heavy_hitters" ->
      """WITH c AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY word),
        |s AS (
        |  SELECT word, n,
        |    CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share
        |  FROM c)
        |SELECT word, n, share FROM s
        |WHERE share >= 0.01 ORDER BY n DESC, word""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |b AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS word_count,
        |    list_transform(range(1, len(toks)),
        |                   i -> toks[i] || ' ' || toks[i + 1]) AS bg
        |  FROM t),
        |p AS (
        |  SELECT doc_id, word_count,
        |    CAST(len(bg) - len(list_distinct(bg)) AS BIGINT) AS dup_bigrams,
        |    1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
        |      AS dup_bigram_ratio
        |  FROM b),
        |w AS (SELECT doc_id, unnest(toks) AS word FROM t),
        |c AS (SELECT doc_id, word, count(*) AS n FROM w GROUP BY 1, 2),
        |f AS (SELECT doc_id, CAST(max(n) AS DOUBLE) / sum(n)
        |        AS top_word_ratio FROM c GROUP BY 1)
        |SELECT p.doc_id, word_count, dup_bigrams, dup_bigram_ratio,
        |       top_word_ratio
        |FROM p JOIN f ON p.doc_id = f.doc_id ORDER BY p.doc_id""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |         regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |         ' +', ' ', 'g')) AS norm_text,
        |  CAST(length(trim(regexp_replace(
        |         regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |         ' +', ' ', 'g'))) AS BIGINT) AS norm_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "gopher_rules" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |s AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS word_count,
         |    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
         |      / len(toks) AS mean_word_len,
         |    CAST(len(list_filter(toks,
         |           x -> contains(x, '#') OR contains(x, '...'))) AS DOUBLE)
         |      / len(toks) AS symbol_ratio,
         |    CAST(len(list_filter(toks,
         |           x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
         |      / len(toks) AS alpha_word_ratio,
         |    CAST(len(list_filter(${sqlList(GopherStops)},
         |           w -> list_contains(list_distinct(toks), w))) AS BIGINT)
         |      AS n_required_stops
         |  FROM t),
         |f AS (
         |  SELECT *,
         |    CAST(word_count >= 50 AND word_count <= 100000 AS INTEGER) AS wc_ok,
         |    CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INTEGER)
         |      AS wlen_ok,
         |    CAST(symbol_ratio <= 0.1 AS INTEGER) AS symbol_ok,
         |    CAST(alpha_word_ratio >= 0.8 AS INTEGER) AS alpha_ok,
         |    CAST(n_required_stops >= 2 AS INTEGER) AS stop_ok
         |  FROM s)
         |SELECT *,
         |  CAST(wc_ok = 1 AND wlen_ok = 1 AND symbol_ok = 1 AND alpha_ok = 1
         |       AND stop_ok = 1 AS INTEGER) AS pass
         |FROM f ORDER BY doc_id""".stripMargin)
}
