package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Approximate-nearest-neighbor search over the `embeddings` table —
  * training-data-pipeline surface (BASELINE.json north_star).
  *
  * Three queries covering the two halves of a production ANN stack:
  *
  *  - `knn_brute`: exact top-k — the BROADCAST side is the (small) query
  *    set, the candidate corpus streams through executors once. At 100 TB
  *    the corpus is the big side and never shuffles; per-query state is a
  *    k-row heap (window top-k per partition, merged by the final rank
  *    filter). This is the recall baseline every ANN variant is measured
  *    against.
  *  - `knn_ivf`: the scale path — probe ONLY the query's IVF cell (the
  *    `label` column is the precomputed coarse-quantizer assignment, as
  *    at ingest time in a real pipeline). The join is keyed on the cell
  *    id, so the plan touches 1/n_cells of the corpus per query instead
  *    of all of it; recall < 1 is the documented tradeoff.
  *  - `knn_ivf_centroids`: the build step — per-cell centroids. Values
  *    are fixed-point-quantized (floor to 1e-6) and summed as BIGINT so
  *    the centroid is independent of partition merge order (a raw DOUBLE
  *    avg is not associative and cannot be hash-verified).
  */
object Similarity {

  /** Library defaults — the gate queries and oracle SQL are generated
    * from these same constants, so a default-argument call reproduces the
    * gate result exactly. */
  private val NumQueries = 10
  private val TopK       = 3

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), Vectors.asDouble(col("embedding")).as("v"))

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nn_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cosine"))
      .presentSorted(col("query_id"), col("rank"))
  }

  /** Exact brute-force cosine top-k: broadcast the query set, stream the
    * corpus. */
  def knnBrute(spark: SparkSession, dir: String,
               numQueries: Int = NumQueries, k: Int = TopK): DataFrame = {
    val all = vecs(spark, dir)
    val q = all.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cand = all.select(col("vec_id").as("nn_id"), col("v").as("w"))
    topK(cand.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cosine", Vectors.cosine(col("qv"), col("w"))), k)
  }

  /** IVF probe: same queries, but candidates come only from the query's
    * own cell — the label-keyed join IS the index. */
  def knnIvf(spark: SparkSession, dir: String,
             numQueries: Int = NumQueries, k: Int = TopK): DataFrame = {
    val all = vecs(spark, dir)
    val q = all.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("label").as("cell"), col("v").as("qv"))
    val cand = all.select(col("vec_id").as("nn_id"), col("label").as("cell_c"),
                          col("v").as("w"))
    topK(cand.join(broadcast(q),
        col("cell_c") === col("cell") && col("nn_id") =!= col("query_id"))
      .withColumn("cosine", Vectors.cosine(col("qv"), col("w"))), k)
  }

  /** IVF build: per-cell centroid, one row per (cell, dimension).
    * Fixed-point quantization (floor x*1e6 → BIGINT) makes the sum exact
    * and partition-order-independent; the final division back to DOUBLE
    * is a fixed expression, identical in both engines. */
  private def centroidRows(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir)
      .select(col("label").as("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(sum(floor(col("x") * 1e6).cast(LongType)).as("qsum"),
           count(lit(1)).as("n"))
      .select(col("cell"), col("dim"),
              (col("qsum").cast(DoubleType) / 1e6 / col("n")).as("centroid"),
              col("n"))

  def knnIvfCentroids(spark: SparkSession, dir: String): DataFrame =
    centroidRows(spark, dir).presentSorted(col("cell"), col("dim"))

  /** Per-cell centroid VECTOR (cell, cv: ARRAY<DOUBLE>) — the coarse
    * quantizer codebook, rebuilt from [[centroidRows]]'s per-dim rows via
    * a dim-sorted collect (deterministic: dims are distinct). One row per
    * cell — tiny at any corpus scale, meant to be broadcast. Shared by
    * [[knnIvfProbe2]]'s probe ranking and [[SemDedup]]'s cell-relative
    * duplicate priority. */
  private[ext] def centroidVectors(spark: SparkSession, dir: String): DataFrame =
    centroidRows(spark, dir)
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid")))),
        s => s.getField("centroid")).as("cv"))

  /** Default number of centroid-ranked cells probed by [[knnIvfProbe2]]
    * (the query's own cell is always unioned in on top). */
  private val ProbeCells = 2

  /** IVF MULTI-probe — the recall dial every production ANN user reaches
    * for first. Cells are ranked per query by cosine to the
    * [[knnIvfCentroids]] centroid (the standard IVF probe-ordering rule);
    * the probe set is the top-[[ProbeCells]] ranked cells UNIONED with the
    * query's own assigned cell, so the candidate set is a strict superset
    * of [[knnIvf]]'s — recall is monotonically ≥ single-probe by
    * construction (SimilarityRecallSpec measures both against
    * [[knnBrute]]). Cost model at scale: the centroid table is one row
    * per (cell, dim) — tiny, broadcast — and the corpus-side join still
    * touches only probed cells' partitions; probing p cells reads p/n_cells
    * of the corpus per query instead of 1/n_cells. The centroid VECTOR is
    * rebuilt from the per-dim rows via a dim-sorted collect (deterministic:
    * dims are distinct), mirroring the oracle's array_agg(ORDER BY dim). */
  def knnIvfProbe2(spark: SparkSession, dir: String,
                   numQueries: Int = NumQueries, k: Int = TopK,
                   probeCells: Int = ProbeCells): DataFrame = {
    val all = vecs(spark, dir)
    val cents = centroidVectors(spark, dir)
    val q = all.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("label").as("qcell"),
              col("v").as("qv"))
    val rankCells = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cell"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("csim", Vectors.cosine(col("qv"), col("cv")))
      .withColumn("crank", row_number().over(rankCells))
      .filter(col("crank") <= probeCells || col("cell") === col("qcell"))
      .select(col("query_id"), col("cell"), col("qv"))
    val cand = all.select(col("vec_id").as("nn_id"), col("label").as("cell_c"),
                          col("v").as("w"))
    topK(cand.join(broadcast(probes),
        col("cell_c") === col("cell") && col("nn_id") =!= col("query_id"))
      .withColumn("cosine", Vectors.cosine(col("qv"), col("w"))), k)
  }

  /** Scalar quantization — the storage-compression companion of the ANN
    * stack: per-dimension global [lo, hi] over the corpus, then each
    * value becomes an int8-range code floor((x−lo)/(hi−lo)·255). Two
    * passes, both scale-flat: the stats aggregate produces ONE ROW PER
    * DIMENSION (64 here — map-side partial sums, broadcast back), and
    * the coding pass is per-row with the broadcast stats; nothing grows
    * with corpus size except the linear scan. Constant-dimension guard:
    * hi = lo → code 0. */
  def embQuantize(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
              posexplode(Vectors.asDouble(col("embedding"))).as(Seq("dim", "x")))
    val stats = d.groupBy(col("dim"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    d.join(broadcast(stats), "dim")
      .select(col("vec_id"), col("dim"),
        when(col("hi") === col("lo"), lit(0))
          .otherwise(floor((col("x") - col("lo")) / (col("hi") - col("lo")) * 255))
          .cast(IntegerType).as("code"))
      .presentSorted(col("vec_id"), col("dim"))
  }

  /** ANN over the QUANTIZED corpus — asymmetric distance computation
    * (ADC), the standard deployment of [[embQuantize]]'s codes: corpus
    * vectors are reconstructed from their int8 codes
    * (x̂ = lo + code/255·(hi−lo)), queries stay full-precision, and the
    * scan is [[knnBrute]]'s broadcast-query shape over the reconstructed
    * side. What this buys at 100 TB: the resident corpus is 4× smaller
    * (int8 vs float32 — 8× vs float64), the scan is memory-bandwidth
    * bound, so throughput scales with the compression; the cost is the
    * quantization error, measured as recall@k vs [[knnBrute]] in
    * SimilarityRecallSpec (256 levels/dim loses almost nothing). */
  def knnQuantized(spark: SparkSession, dir: String,
                   numQueries: Int = NumQueries, k: Int = TopK): DataFrame = {
    val all = vecs(spark, dir)
    val d = all.select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")))
    val stats = d.groupBy(col("dim"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val recon = d.join(broadcast(stats), "dim")
      .withColumn("code",
        when(col("hi") === col("lo"), lit(0))
          .otherwise(floor((col("x") - col("lo")) / (col("hi") - col("lo")) * 255))
          .cast(IntegerType))
      .withColumn("xhat",
        col("lo") + col("code").cast(DoubleType) / 255.0 * (col("hi") - col("lo")))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("xhat")))),
        s => s.getField("xhat")).as("w"))
    val q = all.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    topK(recon.select(col("vec_id").as("nn_id"), col("w"))
      .crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cosine", Vectors.cosine(col("qv"), col("w"))), k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_brute"         -> ((s, d) => knnBrute(s, d)),
    "knn_ivf"           -> ((s, d) => knnIvf(s, d)),
    "knn_ivf_probe2"    -> ((s, d) => knnIvfProbe2(s, d)),
    "knn_ivf_centroids" -> knnIvfCentroids _,
    "emb_quantize"      -> embQuantize _)

  /** Spec-verified only (SimilarityRecallSpec): the recall number is the
    * contract; the code path reuses gate-verified pieces ([[embQuantize]]
    * arithmetic, [[knnBrute]] scan shape). */
  val specQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_quantized" -> ((s, d) => knnQuantized(s, d)))

  private[ext] def cosineSqlOf(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
       |      z -> struct_extract(z, 1) * struct_extract(z, 2)))
       |      / (sqrt(list_sum(list_transform($a, x -> x * x)))
       |         * sqrt(list_sum(list_transform($b, x -> x * x))))""".stripMargin

  private val cosineSql = cosineSqlOf("q.qv", "c.w")

  val oracles: Map[String, String] = Map(
    "knn_brute" ->
      s"""WITH v AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < $NumQueries),
         |c AS (SELECT vec_id AS nn_id, v AS w FROM v),
         |s AS (
         |  SELECT q.query_id, c.nn_id, $cosineSql AS cosine
         |  FROM c CROSS JOIN q WHERE c.nn_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |                ORDER BY cosine DESC, nn_id) AS rank FROM s)
         |SELECT query_id, rank, nn_id, cosine FROM r
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,
    "knn_ivf" ->
      s"""WITH v AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, label AS cell, v AS qv
         |      FROM v WHERE vec_id < $NumQueries),
         |c AS (SELECT vec_id AS nn_id, label AS cell_c, v AS w FROM v),
         |s AS (
         |  SELECT q.query_id, c.nn_id, $cosineSql AS cosine
         |  FROM c JOIN q ON c.cell_c = q.cell WHERE c.nn_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |                ORDER BY cosine DESC, nn_id) AS rank FROM s)
         |SELECT query_id, rank, nn_id, cosine FROM r
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,
    "knn_ivf_probe2" ->
      s"""WITH v AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |d AS (
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
         |q AS (SELECT vec_id AS query_id, label AS qcell, v AS qv
         |      FROM v WHERE vec_id < $NumQueries),
         |scored AS (
         |  SELECT q.query_id, q.qcell, q.qv, cv.cell,
         |    ${cosineSqlOf("q.qv", "cv.cv")} AS csim
         |  FROM q CROSS JOIN cv),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                ORDER BY csim DESC, cell) AS crank FROM scored),
         |probe AS (SELECT query_id, cell, qv FROM ranked
         |          WHERE crank <= $ProbeCells OR cell = qcell),
         |c AS (SELECT vec_id AS nn_id, label AS cell_c, v AS w FROM v),
         |s AS (
         |  SELECT q.query_id, c.nn_id, $cosineSql AS cosine
         |  FROM c JOIN probe q ON c.cell_c = q.cell WHERE c.nn_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |                ORDER BY cosine DESC, nn_id) AS rank FROM s)
         |SELECT query_id, rank, nn_id, cosine FROM r
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,
    "emb_quantize" ->
      """WITH d AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |s AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM d GROUP BY 1)
        |SELECT vec_id, d.dim,
        |  CAST(CASE WHEN hi = lo THEN 0
        |            ELSE floor((x - lo) / (hi - lo) * 255) END AS INTEGER) AS code
        |FROM d JOIN s ON d.dim = s.dim ORDER BY vec_id, d.dim""".stripMargin,
    "knn_ivf_centroids" ->
      """WITH d AS (
        |  SELECT label AS cell, generate_subscripts(embedding, 1) - 1 AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings)
        |SELECT cell, dim,
        |  CAST(sum(CAST(floor(x * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / count(*)
        |    AS centroid,
        |  count(*) AS n
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
