package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** SemDeDup-style SEMANTIC deduplication over the `embeddings` table —
  * the cell-relative dedup family large corpus-curation runs deploy
  * (Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication", arXiv:2303.09540).
  *
  * Where [[Dedup.dedupEmbedding]] reports each vector's nearest blocked
  * neighbor (an absolute near-dup detector), SemDeDup is a KEEP/DROP
  * policy relative to the vector's own cluster: embeddings are assigned
  * to k-means cells (here the precomputed `label` coarse-quantizer
  * column, the same assignment [[Similarity.knnIvf]] probes — a real
  * pipeline writes it at ingest), every member is scored by cosine to its
  * cell CENTROID, and within a cell any pair above the duplicate
  * threshold drops the member CLOSER to the centroid. The paper's
  * finding, preserved here: among semantic duplicates, the far-from-
  * centroid example carries the most marginal information, so the kept
  * representative of every duplicate chain is its lowest-centroid-cosine
  * member.
  *
  * Candidate bound (the 100 TB posture, same contract as
  * [[Dedup.dedupEmbedding]]): the within-cell pair scan is NOT
  * O(Σ|cell|²) — members are ranked by the deterministic fixed-point
  * 1-D projection, cut into blocks of [[BlockW]], and each vector is
  * compared against at most 3·[[BlockW]] − 1 candidates (own block +
  * both adjacent), keyed as an EQUI-join on (label, block). The centroid
  * codebook ([[Similarity.centroidVectors]]) is one row per cell —
  * broadcast, never shuffled with the corpus. Recall tradeoff: a
  * duplicate pair > [[BlockW]] ranks apart in projection order is
  * missed; widen the block to trade cost for recall.
  *
  * Determinism: the centroid is the fixed-point (floor·1e6 BIGINT)
  * per-dim mean, so both engines build bit-identical codebooks; all
  * cosines go through [[graft.functions.ArrayDot]]'s strict
  * left-to-right fold, bit-identical to DuckDB's `list_sum(list_zip)`
  * (FunctionsSpec pins the parity). Ties in centroid-cosine fall back
  * to vec_id, so the drop set is a pure function of the data.
  */
object SemDedup {

  /** Sorted-neighborhood block width — each vector sees ≤ 3·W − 1
    * within-cell candidates (shared bound with [[Dedup.dedupEmbedding]],
    * ext/Dedup.scala:583). */
  private val BlockW = 32

  /** Pair-cosine duplicate threshold. The paper sweeps ε on normalized
    * real embeddings (dup at cosine ≈ 0.95+); this synthetic corpus's
    * within-label cosine p99 is ≈ 0.3 (measured for
    * [[Dedup.dedupEmbedding]]'s near-dup flag), so the library default
    * sits at the same calibrated point — pass `tau` to retune. */
  private val Tau = 0.3

  /** One row per vector: (vec_id, label, centroid_sim, is_dup).
    * `is_dup = 1` means a same-cell blocked candidate with pair-cosine
    * ≥ `tau` exists whose centroid-cosine is lower (or equal with a
    * lower vec_id) — i.e. the vector is the near-centroid member of a
    * duplicate pair and a SemDeDup pass would drop it. The lowest-
    * priority member of every duplicate chain always survives, so the
    * kept set is never empty per chain. */
  def dedupSemantic(spark: SparkSession, dir: String,
                    blockW: Int = BlockW, tau: Double = Tau): DataFrame = {
    val cents = Similarity.centroidVectors(spark, dir)
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(Vectors.dot(col("v"), col("v"))))
      .withColumn("proj", // exact fixed-point sum → same rank in any engine
        aggregate(col("v"), lit(0L), (s, x) => s + floor(x * 1e6).cast(LongType)))
    val rankW = Window.partitionBy(col("label")).orderBy(col("proj"), col("vec_id"))
    // The blocked+scored frame feeds BOTH the pair join (twice: probe and
    // candidate side) and the final output — pin it so the label-window
    // shuffle and the centroid join run once, not four times
    // (CacheScope-ledgered; Bench/Verify release between queries).
    val blocked = graft.CacheScope.pin(
      vecs.join(broadcast(cents), col("label") === col("cell"))
        // reuse the precomputed nrm instead of Vectors.cosine, which
        // would re-run the O(d) self-dot per row; same operands, same
        // multiply/sqrt order, so the value is bit-identical to the
        // oracle's cosine expression
        .withColumn("csim", Vectors.dot(col("v"), col("cv")) /
          (col("nrm") * sqrt(Vectors.dot(col("cv"), col("cv")))))
        .withColumn("blk", floor((row_number().over(rankW) - 1) / blockW))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"),
                col("csim"), col("blk")))
    val probes = blocked
      .withColumn("bkey", explode(array(col("blk") - 1, col("blk"), col("blk") + 1)))
      .select(col("vec_id"), col("label"), col("v"), col("nrm"), col("csim"),
              col("bkey"))
    val cands = blocked.select(col("vec_id").as("nn_id"), col("label").as("label_b"),
      col("v").as("w"), col("nrm").as("nrm_b"), col("csim").as("csim_b"), col("blk"))
    val dropped = probes.join(cands,
        col("label") === col("label_b") && col("bkey") === col("blk") &&
        col("vec_id") =!= col("nn_id"))
      .filter(Vectors.dot(col("v"), col("w")) / (col("nrm") * col("nrm_b")) >= tau &&
        (col("csim_b") < col("csim") ||
         (col("csim_b") === col("csim") && col("nn_id") < col("vec_id"))))
      .select(col("vec_id")).distinct()
      .withColumn("dup", lit(1))
    graft.Present.sorted(
      blocked.join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("label"), col("csim").as("centroid_sim"),
                coalesce(col("dup"), lit(0)).as("is_dup")),
      col("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_semantic" -> ((s, d) => dedupSemantic(s, d)))

  val oracles: Map[String, String] = Map(
    "dedup_semantic" ->
      s"""WITH d AS (
         |  SELECT label AS cell, generate_subscripts(embedding, 1) - 1 AS dim,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |cent AS (
         |  SELECT cell, dim,
         |    CAST(sum(CAST(floor(x * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / count(*)
         |      AS centroid
         |  FROM d GROUP BY 1, 2),
         |cv AS (SELECT cell, array_agg(centroid ORDER BY dim) AS cv
         |       FROM cent GROUP BY 1),
         |v0 AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |v AS (
         |  SELECT vec_id, label, v,
         |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
         |    list_sum(list_transform(v, x -> CAST(floor(x * 1e6) AS BIGINT))) AS proj
         |  FROM v0),
         |s AS (
         |  SELECT v.*, ${Similarity.cosineSqlOf("v.v", "cv.cv")} AS csim
         |  FROM v JOIN cv ON v.label = cv.cell),
         |b AS (
         |  SELECT *, CAST(floor((row_number() OVER (PARTITION BY label
         |              ORDER BY proj, vec_id) - 1) / $BlockW) AS BIGINT) AS blk
         |  FROM s),
         |e AS (
         |  SELECT b.*, b.blk + dd.d AS bkey
         |  FROM b CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dd),
         |drp AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM e a JOIN b c ON a.label = c.label AND a.bkey = c.blk
         |                   AND a.vec_id <> c.vec_id
         |  WHERE list_sum(list_transform(list_zip(a.v, c.v),
         |          z -> struct_extract(z, 1) * struct_extract(z, 2)))
         |          / (a.nrm * c.nrm) >= $Tau
         |    AND (c.csim < a.csim OR (c.csim = a.csim AND c.vec_id < a.vec_id)))
         |SELECT b.vec_id, b.label, b.csim AS centroid_sim,
         |  CAST(b.vec_id IN (SELECT vec_id FROM drp) AS INTEGER) AS is_dup
         |FROM b ORDER BY b.vec_id""".stripMargin)
}
