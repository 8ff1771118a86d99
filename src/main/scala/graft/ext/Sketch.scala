package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al.
  * 2002 / Beyer et al. 2007's unbiased estimator `D̂ = (k−1)/h₍ₖ₎`
  * over the k smallest distinct hash values, the sketch behind
  * DataSketches' theta family. The 100 TB motivation: EXACT distinct
  * counting of a corpus-scale universe (here the width-3 word windows
  * that drive near-dup and decontamination economics) shuffles the
  * whole universe; the KMV sketch is a BOUNDED aggregate — O(k) state
  * per partial, one exchange of O(k × partitions) rows, mergeable
  * across shards/days by construction (sketch union = merge the
  * sorted arrays, keep k smallest).
  *
  * The sketch is a custom typed [[Aggregator]] (the one §2.G case the
  * SURVEY reserves for genuinely stateful aggregation Spark lacks):
  * each partial keeps a SORTED ascending array of ≤ k distinct hashes;
  * `reduce` is O(log k) compare for the common miss (hv ≥ current max
  * once warm — probability k/seen), O(k) copy only on the rare hit;
  * `merge` is one linear sorted-merge. Determinism: pure set
  * semantics — arrival order cannot change the k smallest.
  *
  * Hash: the first 48 bits of the window's md5, divided by 2⁴⁸ — one
  * exact integer extraction plus one IEEE division, bit-identical in
  * DuckDB ([[Scoring.fakeLogit]]'s convention at sketch precision).
  * The oracle replays the estimator declaratively (DISTINCT → ORDER
  * BY → LIMIT k), which is also the in-engine witness path
  * SketchSpec pins against the Aggregator.
  *
  * The gate row carries the EXACT distinct beside the estimate (the
  * error audit a sketch rollout runs at small scale before trusting
  * the estimator at large); at 100 TB the exact column is the thing
  * you stop computing.
  */
object Sketch {

  private[ext] val K = 256
  private[ext] val W = 3
  private val TwoPow48 = 281474976710656.0 // 2^48, exact in double

  /** Bounded k-minimum-values buffer: sorted ascending, distinct,
    * length ≤ k. */
  class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], KmvState] {
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], hv: Long): Array[Long] = {
      if (b.length == k && hv >= b(b.length - 1)) return b
      val i = java.util.Arrays.binarySearch(b, hv)
      if (i >= 0) return b // already a member
      val at = -i - 1
      val n = math.min(b.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(b, 0, out, 0, at)
      out(at) = hv
      System.arraycopy(b, at, out, at + 1, n - at - 1)
      out
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var (i, j, o) = (0, 0, 0)
      while (o < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { val v = b(j); j += 1; v }
          else if (j >= b.length) { val v = a(i); i += 1; v }
          else if (a(i) < b(j)) { val v = a(i); i += 1; v }
          else if (a(i) > b(j)) { val v = b(j); j += 1; v }
          else { val v = a(i); i += 1; j += 1; v } // shared member, once
        out(o) = take
        o += 1
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(b: Array[Long]): KmvState =
      KmvState(b.length.toLong, if (b.isEmpty) -1L else b(b.length - 1))

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[KmvState] = Encoders.product[KmvState]
  }

  /** Sketch summary: how many slots filled, and the k-th (max kept)
    * 48-bit hash — the estimator's denominator. */
  case class KmvState(k_filled: Long, kth: Long)

  /** [[KmvAgg]] with the FULL k-min array as the result — the form the
    * persisted artifact needs (the summary is derivable from the array;
    * the array is not derivable from the summary, and union needs the
    * array). Same buffer semantics, shared with [[KmvAgg]]. */
  class KmvArrayAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    private val core = new KmvAgg(k)
    override def zero: Array[Long] = core.zero
    override def reduce(b: Array[Long], hv: Long): Array[Long] =
      core.reduce(b, hv)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      core.merge(a, b)
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The KMV estimate off (k_filled, kth), UNDERFILL-correct: a sketch
    * that never filled its k slots has seen every distinct value — the
    * estimate IS k_filled, exactly (the standard KMV small-range rule;
    * the (k−1)/h₍ₖ₎ formula assumes h₍ₖ₎ is the k-th order statistic
    * of a full buffer and would answer ≈ k−1 regardless of the truth
    * on an underfilled one). Also covers the empty corner (kth = −1 →
    * estimate 0). */
  private def estCol(k: Int) =
    when(col("k_filled") < k, col("k_filled").cast(DoubleType))
      .otherwise(lit((k - 1).toDouble) /
        (col("kth").cast(DoubleType) / lit(TwoPow48)))

  /** Oracle spelling of [[estCol]] over CTE alias `$a`. */
  private def estSql(k: Int, a: String): String =
    s"""CASE WHEN $a.k_filled < $k THEN CAST($a.k_filled AS DOUBLE)
       |     ELSE ${k - 1}.0 / (CAST($a.kth AS DOUBLE) / 281474976710656.0)
       |     END""".stripMargin

  /** Gate query: ONE aggregate computes the KMV sketch (bounded state)
    * and the exact distinct (the gate-scale audit column) over the
    * corpus's width-[[W]] word windows, then derives the estimate and
    * its error in ppm — all from integer-exact inputs through single
    * IEEE ops. */
  def distinctKmv(spark: SparkSession, dir: String, k: Int = K): DataFrame = {
    val kmv = udaf(new KmvAgg(k))
    val hv = Tables.documents(spark, dir)
      .select(explode(graft.functions.WordWindowMd5(col("text"), lit(W)))
        .as("digest"))
      .select(col("digest"),
        conv(substring(col("digest"), 1, 12), 16, 10).cast(LongType).as("hv"))
    val est = estCol(k)
    hv.agg(kmv(col("hv")).as("s"),
           countDistinct(col("digest")).as("exact_distinct"))
      .select(col("s.k_filled").as("k_filled"), col("s.kth").as("kth"),
              est.as("est_distinct"), col("exact_distinct"))
      .withColumn("err_ppm",
        floor(abs(col("est_distinct") - col("exact_distinct").cast(DoubleType))
              / col("exact_distinct") * lit(1000000.0)).cast(LongType))
  }

  /** Grouped sketch — the realistic rollup usage (per-language here;
    * per-domain/per-day in production): ONE pass builds an independent
    * KMV sketch per group key, partial buffers merging map-side like
    * any other aggregate. This is the mergeability dividend: the same
    * aggregate that answers "distinct windows per language" also
    * answers the global question by UNIONING the per-group sketches —
    * no second scan (SketchSpec proves the union identity). */
  def distinctKmvByLang(spark: SparkSession, dir: String,
                        k: Int = K): DataFrame = {
    val kmv = udaf(new KmvAgg(k))
    val est = estCol(k)
    graft.Present.sorted(
      Tables.documents(spark, dir)
        .select(col("lang"),
          explode(graft.functions.WordWindowMd5(col("text"), lit(W)))
            .as("digest"))
        .select(col("lang"), col("digest"),
          conv(substring(col("digest"), 1, 12), 16, 10).cast(LongType)
            .as("hv"))
        .groupBy(col("lang"))
        .agg(kmv(col("hv")).as("s"),
             countDistinct(col("digest")).as("exact_distinct"))
        .select(col("lang"), col("s.k_filled").as("k_filled"),
                col("s.kth").as("kth"), est.as("est_distinct"),
                col("exact_distinct")),
      col("lang"))
  }

  /** ==== Sketch ARTIFACT maintenance (the per-shard/per-day cycle the
    * mergeability claim implies) ====
    *
    * A persisted sketch is its k-min array, one BIGINT row per kept
    * hash — engine-neutral parquet, tiny (≤ k rows), and UNIONABLE:
    * tomorrow's batch sketch merges into the standing artifact without
    * ever re-reading yesterday's data. SketchSpec proves the cycle:
    * sketch(A) persisted, then merged with sketch(B), is bit-identical
    * to sketch(A ∪ B) computed in one pass. */
  def writeSketch(df: DataFrame, k: Int, path: String): Unit = {
    val kmv = udaf(new KmvArrayAgg(k))
    df.agg(kmv(col("hv")).as("mins"))
      .select(explode(col("mins")).as("hv"))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted sketch and fold a new batch's sketch into it —
    * returns the merged KmvState (what [[distinctKmv]]'s gate columns
    * derive from). The artifact side never exceeds k rows (safe to
    * collect by construction); the batch side is one bounded
    * aggregate. */
  def mergeSketch(spark: SparkSession, batch: DataFrame, k: Int,
                  path: String): KmvState = {
    val agg = new KmvAgg(k)
    val stored = spark.read.parquet(path)
      .orderBy(col("hv")).collect().map(_.getLong(0))
    val kmv = udaf(new KmvArrayAgg(k))
    val fresh = batch.agg(kmv(col("hv")).as("mins"))
      .collect().head.getSeq[Long](0).toArray
    agg.finish(agg.merge(stored, fresh))
  }

  private[ext] val SweepKs = Seq(64, 128, 256, 512)

  /** The measured error-vs-k curve the 1/√(k−2) sizing claim reduces
    * to in practice — the audit an operator runs ONCE at small scale
    * to pick k before trusting the estimator at 100 TB. One scan, one
    * bounded aggregate: the k smallest distinct hashes are a PREFIX of
    * the k′ smallest for every k < k′ (sorted-ascending set order is
    * composition-free), so a single [[KmvArrayAgg]] at max(k) yields
    * every smaller k's sketch by slicing — four estimators priced at
    * one, O(max k × partitions) exchange, exactly [[distinctKmv]]'s
    * economics. Output: one row per k with the sketch summary, the
    * estimate, the exact distinct (the audit column) and the error in
    * ppm — the table an operator reads k off. */
  // NON-EMPTY-corpus assumption (r20 ADVICE, documented rather than
  // guarded): on an empty `documents` table this emits |SweepKs| rows
  // with kth = −1 and a divide-by-zero err_ppm, while the oracle's
  // inner join yields zero rows. The gate fixtures guarantee a
  // non-empty corpus at every SF, and the standing `distinct_kmv`
  // shares the same est/exact division — changing either side's
  // empty-corpus behavior would change what the query computes, which
  // an optimization round must not do; the assumption is recorded here
  // instead.
  def distinctKmvSweep(spark: SparkSession, dir: String): DataFrame = {
    val kMax = SweepKs.max
    val kmv = udaf(new KmvArrayAgg(kMax))
    val hv = Tables.documents(spark, dir)
      .select(explode(graft.functions.WordWindowMd5(col("text"), lit(W)))
        .as("digest"))
      .select(col("digest"),
        conv(substring(col("digest"), 1, 12), 16, 10).cast(LongType).as("hv"))
    // prefix slicing: k_filled = min(|mins|, k); kth = mins[k] when the
    // prefix fills, else the max kept (underfill) or −1 (empty) — the
    // exact finish() rule replayed per k
    val estV =
      when(col("k_filled") < col("k"), col("k_filled").cast(DoubleType))
        .otherwise((col("k") - 1).cast(DoubleType) /
          (col("kth").cast(DoubleType) / lit(TwoPow48)))
    hv.agg(kmv(col("hv")).as("mins"),
           countDistinct(col("digest")).as("exact_distinct"))
      .select(explode(lit(SweepKs.toArray)).as("kk"), col("mins"),
              col("exact_distinct"))
      .select(col("kk").cast(LongType).as("k"),
        least(size(col("mins")), col("kk")).cast(LongType).as("k_filled"),
        when(size(col("mins")) >= col("kk"),
            element_at(col("mins"), col("kk")))
          .otherwise(when(size(col("mins")) === 0, lit(-1L))
            .otherwise(element_at(col("mins"), size(col("mins")))))
          .as("kth"),
        col("exact_distinct"))
      .withColumn("est_distinct", estV)
      .withColumn("err_ppm",
        floor(abs(col("est_distinct") - col("exact_distinct").cast(DoubleType))
              / col("exact_distinct") * lit(1000000.0)).cast(LongType))
      .select(col("k"), col("k_filled"), col("kth"), col("est_distinct"),
              col("exact_distinct"), col("err_ppm"))
      .orderBy(col("k"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "distinct_kmv" -> ((s, d) => distinctKmv(s, d)),
    "distinct_kmv_by_lang" -> ((s, d) => distinctKmvByLang(s, d)),
    "distinct_kmv_sweep" -> ((s, d) => distinctKmvSweep(s, d)))

  val oracles: Map[String, String] = Map(
    "distinct_kmv_sweep" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS MATERIALIZED (
         |  SELECT md5(array_to_string(toks[i:i + ${W - 1}], ' ')) AS digest
         |  FROM (SELECT toks, unnest(range(1, len(toks) - ${W - 2})) AS i
         |        FROM t WHERE len(toks) >= $W)),
         |h AS MATERIALIZED (
         |  SELECT DISTINCT ('0x' || substr(digest, 1, 12))::BIGINT AS hv
         |  FROM g),
         |r AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM h),
         |ks AS (SELECT unnest([${SweepKs.mkString(", ")}]) AS k),
         |s AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS k_filled,
         |             CAST(max(hv) AS BIGINT) AS kth
         |      FROM ks JOIN r ON r.rn <= ks.k GROUP BY ks.k),
         |e AS (SELECT CAST(count(DISTINCT digest) AS BIGINT)
         |        AS exact_distinct FROM g)
         |SELECT CAST(k AS BIGINT) AS k, k_filled, kth, est_distinct,
         |  exact_distinct,
         |  CAST(floor(abs(est_distinct - CAST(exact_distinct AS DOUBLE))
         |             / exact_distinct * 1000000.0) AS BIGINT) AS err_ppm
         |FROM (
         |  SELECT s.k, s.k_filled, s.kth,
         |    CASE WHEN s.k_filled < s.k THEN CAST(s.k_filled AS DOUBLE)
         |         ELSE CAST(s.k - 1 AS DOUBLE)
         |              / (CAST(s.kth AS DOUBLE) / 281474976710656.0)
         |         END AS est_distinct,
         |    e.exact_distinct
         |  FROM s CROSS JOIN e)
         |ORDER BY k""".stripMargin,
    "distinct_kmv_by_lang" ->
      s"""WITH t AS (
         |  SELECT lang, string_split(text, ' ') AS toks FROM documents),
         |g AS MATERIALIZED (
         |  SELECT lang, md5(array_to_string(toks[i:i + ${W - 1}], ' '))
         |    AS digest
         |  FROM (SELECT lang, toks, unnest(range(1, len(toks) - ${W - 2}))
         |          AS i
         |        FROM t WHERE len(toks) >= $W)),
         |h AS MATERIALIZED (
         |  SELECT DISTINCT lang,
         |    ('0x' || substr(digest, 1, 12))::BIGINT AS hv
         |  FROM g),
         |kk AS (
         |  SELECT lang, hv FROM (
         |    SELECT lang, hv,
         |      row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
         |    FROM h) WHERE rn <= $K),
         |s AS (SELECT lang, CAST(count(*) AS BIGINT) AS k_filled,
         |             CAST(max(hv) AS BIGINT) AS kth
         |      FROM kk GROUP BY lang),
         |e AS (SELECT lang, CAST(count(DISTINCT digest) AS BIGINT)
         |        AS exact_distinct FROM g GROUP BY lang)
         |SELECT s.lang, s.k_filled, s.kth,
         |  ${estSql(K, "s")} AS est_distinct,
         |  e.exact_distinct
         |FROM s JOIN e ON e.lang = s.lang
         |ORDER BY s.lang""".stripMargin,
    "distinct_kmv" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS MATERIALIZED (
         |  SELECT md5(array_to_string(toks[i:i + ${W - 1}], ' ')) AS digest
         |  FROM (SELECT toks, unnest(range(1, len(toks) - ${W - 2})) AS i
         |        FROM t WHERE len(toks) >= $W)),
         |h AS MATERIALIZED (
         |  SELECT DISTINCT ('0x' || substr(digest, 1, 12))::BIGINT AS hv
         |  FROM g),
         |kk AS (SELECT hv FROM h ORDER BY hv LIMIT $K),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS k_filled,
         |             CAST(max(hv) AS BIGINT) AS kth FROM kk),
         |e AS (SELECT CAST(count(DISTINCT digest) AS BIGINT)
         |        AS exact_distinct FROM g)
         |SELECT k_filled, kth, est_distinct, exact_distinct,
         |  CAST(floor(abs(est_distinct - CAST(exact_distinct AS DOUBLE))
         |             / exact_distinct * 1000000.0) AS BIGINT) AS err_ppm
         |FROM (
         |  SELECT s.k_filled, s.kth,
         |    ${estSql(K, "s")} AS est_distinct,
         |    e.exact_distinct
         |  FROM s CROSS JOIN e)""".stripMargin)
}
