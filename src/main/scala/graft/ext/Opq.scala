package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Optimized Product Quantization's rotation rung (Ge et al., CVPR
  * 2013): apply an ORTHOGONAL transform R before the subspace split so
  * the subspaces decorrelate, then train/encode/search with the
  * UNCHANGED [[Pq]] chain on R·v. Because R is orthogonal, L2
  * distances — and therefore the ADC ranking — are preserved in the
  * rotated basis; what changes is how the per-subspace codebooks can
  * allocate their bits, which is where the published recall gain at
  * identical storage comes from.
  *
  * The rotation here is the STRUCTURED member of the family: a signed
  * Hadamard transform, R = (1/√d)·H·D with H the order-64 Hadamard
  * matrix (H[i][j] = (−1)^popcount(i AND j)) and D a fixed ±1 diagonal
  * — the classic "random rotation" baseline of Ge et al. §5 / Jégou et
  * al.'s structured variant, made DETERMINISTIC so the DuckDB oracle
  * replays it exactly. Full OPQ alternates an SVD-based R update with
  * codebook training; that needs a dense eigensolver, which is neither
  * a one-pass distributed shape nor SQL-replayable — the honest
  * statement is that this ships the rotation CONTRACT (decorrelating
  * orthogonal basis, measured beside the un-rotated chain) with the
  * published structured default, and a learned R drops in by swapping
  * the matrix rows.
  *
  * Exactness, not just determinism: every matrix entry is ±1 and the
  * normalization 1/√64 = 0.125 is a power of two, so the rotation is a
  * dot product of exact ±1 factors followed by an exact binary scale —
  * Spark's [[graft.functions.ArrayDot]] and DuckDB's
  * `list_dot_product` accumulate left-to-right over IDENTICAL
  * literals, giving bit-identical rotated vectors and therefore a
  * hash-exact gate through the entire downstream trainer.
  *
  * 100 TB shape: the rotation is one map-only projection — 64 codegen'd
  * array dots per row against plan-literal rows, no shuffle, no
  * broadcast state, nothing driver-side; everything after it is
  * [[Pq]]'s already-audited chain.
  */
object Opq {

  /** The synthetic embeddings' dimensionality; the Hadamard closed
    * form needs a power of two. */
  private[ext] val Dim = graft.functions.HadamardRotate.Dim

  /** ±1 sign row i of H·D — delegated to the native expression's
    * object, the single source of truth for engine loop and oracle
    * literals alike. */
  private[graft] def signRow(i: Int): Array[Double] =
    graft.functions.HadamardRotate.signRow(i)

  /** R·v as one native expression — see [[graft.functions
    * .HadamardRotate]] for why not 64 composed [[graft.functions
    * .ArrayDot]]s (the 14 KB generated method blew HotSpot's JIT
    * ceiling and ran interpreted at ~0.3 ms/row). */
  private[graft] def rotate(v: Column): Column =
    graft.functions.HadamardRotate(v)

  private def rotatedVecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v0"))
      .select(col("vec_id"), rotate(col("v0")).as("v"))

  /** Gate query: the rotated vectors for the first
    * [[Pq.NumQueries]]·10 ids, exploded to scalar (vec_id, dim,
    * rv_ppm) rows — the direct exactness pin on the basis change,
    * separate from the trainer chain on top of it. (The driver's
    * compare hashes scalars, so the DOUBLE is ppm-floored the same
    * way the trainer's own update sums are; bit-level agreement is
    * what makes the downstream `knn_opq` chain hash-exact.) */
  def opqRotate(spark: SparkSession, dir: String,
                maxId: Int = Pq.NumQueries * 10): DataFrame = {
    import org.apache.spark.sql.types.LongType
    graft.Present.sorted(
      rotatedVecs(spark, dir).filter(col("vec_id") < maxId)
        .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .select(col("vec_id"), col("dim").cast(LongType).as("dim"),
                floor(col("x") * lit(1000000L)).cast(LongType).as("rv_ppm")),
      col("vec_id"), col("dim"))
  }

  /** Gate query: [[Pq.knnPq]]'s exact chain on the rotated basis —
    * train, encode, ADC-rank. Recall@3 is measured beside `knn_pq` in
    * OpqSpec (X10b practice: measured, not assumed — on these diffuse
    * synthetic embeddings the rotation is near-neutral; the gain
    * appears on correlated real embeddings, which is Ge et al.'s
    * point). */
  def knnOpq(spark: SparkSession, dir: String,
             m: Int = Pq.NumSubs, k: Int = Pq.NumCells,
             rounds: Int = Pq.NumRounds,
             numQueries: Int = Pq.NumQueries, topK: Int = Pq.TopK): DataFrame =
    Pq.knnPqFrame(rotatedVecs(spark, dir), m, k, rounds, numQueries, topK)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "opq_rotate" -> ((s, d) => opqRotate(s, d)),
    "knn_opq"    -> ((s, d) => knnOpq(s, d)))

  /** ±1 row as a SQL list literal (integers — DuckDB casts to DOUBLE
    * exactly). */
  private def rowSql(i: Int): String =
    signRow(i).map(x => if (x > 0) "1" else "-1").mkString("[", ",", "]")

  /** The rotated-source CTE both oracles share: the SAME Scala sign
    * rows [[signRow]] are rendered as literals, so the two engines
    * cannot disagree on the matrix. */
  private def rotatedSrcSql: String =
    s"""rsrc AS MATERIALIZED (
       |  SELECT vec_id, [
       |    ${(0 until Dim).map(i => s"list_dot_product(v, ${rowSql(i)}) * 0.125")
                .mkString(",\n    ")}] AS v
       |  FROM (SELECT vec_id,
       |          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |        FROM embeddings))""".stripMargin

  val oracles: Map[String, String] = Map(
    "opq_rotate" ->
      s"""WITH $rotatedSrcSql
         |SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
         |  CAST(floor(v[i] * 1000000) AS BIGINT) AS rv_ppm
         |FROM (SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i
         |      FROM rsrc)
         |WHERE vec_id < ${Pq.NumQueries * 10}
         |ORDER BY vec_id, dim""".stripMargin,
    "knn_opq" ->
      s"""WITH $rotatedSrcSql,
         |${Pq.subCtesFrom("rsrc", "")},
         |${Pq.roundCtes(Pq.NumRounds)},
         |codes AS (${Pq.codesSql(Pq.NumRounds)}),
         |qd AS (${Pq.qdSql(Pq.NumRounds, Pq.NumQueries)}),
         |${Pq.adcRankSql(Pq.TopK)}""".stripMargin)
}
