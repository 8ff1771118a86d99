package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Link-graph analytics for corpus curation — PageRank as iterated
  * join + aggregate, the power-iteration form that scales: each round is
  * one edge-key shuffle of O(E) contribution rows plus an O(V)
  * aggregation; no adjacency matrix, no driver-side graph.
  *
  * Complements [[Cluster.connectedComponents]] (same iterative-DataFrame
  * discipline: `localCheckpoint` per round truncates the lineage so round
  * N never re-executes rounds 1..N−1; production swaps in reliable
  * `checkpoint()` to a DFS dir, same call shape).
  */
object Graph {

  /** Damped PageRank over a directed graph.
    *
    * Semantics (the standard formulation): ranks start uniform at 1/N;
    * each round every node keeps `(1−d)/N` teleport mass plus `d` times
    * (the rank shares of its in-neighbors + an equal slice of the total
    * DANGLING mass — rank held by nodes with no out-edges). Total rank
    * stays exactly 1 every round, which GraphSpec pins.
    *
    * Scale shape per round: contributions are `edges ⋈ ranks` on the
    * src key — one hash exchange of O(E) rows — then a groupBy(dst)
    * partial-aggregated sum. The dangling total and N are 1-row frames
    * crossed in (BroadcastNestedLoop on a single row — never a
    * cartesian of data frames). Fixed `iters`, not convergence-tested:
    * curation wants a reproducible budget, and 10 damped rounds bound
    * the residual by d^10 < 0.2.
    *
    * @param nodes one column `id`
    * @param edges columns `src`, `dst`; self-loops and duplicate edges
    *              dropped (a syndication graph is unweighted)
    * @return (id, rank) — ranks sum to 1
    */
  def pageRank(nodes: DataFrame, edges: DataFrame,
               iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val v = nodes.select(col("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = v.agg(count(lit(1)).as("n_nodes"))
    var ranks = v.crossJoin(nNodes)
      .select(col("id"), (lit(1.0) / col("n_nodes")).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      // rank share each linking node passes per out-edge
      val shares = ranks
        .join(outDeg, ranks("id") === outDeg("src"))
        .select(outDeg("src").as("from"), (col("rank") / col("deg")).as("share"))
      val inMass = e
        .join(shares, e("src") === col("from"))
        .groupBy(e("dst")).agg(sum(col("share")).as("in_mass"))
      // rank stuck on sinks — redistributed uniformly, else total decays
      val dangling = ranks
        .join(outDeg, ranks("id") === outDeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dangling"))
      ranks = v
        .join(inMass, v("id") === col("dst"), "left")
        .crossJoin(dangling).crossJoin(nNodes)
        .select(
          v("id"),
          (lit(1.0 - damping) / col("n_nodes")
            + lit(damping) * (coalesce(col("in_mass"), lit(0.0))
                               + col("dangling") / col("n_nodes"))).as("rank"))
        .localCheckpoint()
    }
    e.unpersist(); v.unpersist(); outDeg.unpersist()
    ranks
  }

  /** Gate query: PageRank over the content-SYNDICATION graph — sources
    * are linked when near-duplicate documents (the Jaccard-verified
    * MinHash-LSH pairs, [[Dedup.dedupMinhashLsh]]) appear under BOTH, the
    * standard signal for mirror/aggregator domains whose weight a
    * curation pass discounts. Float ranks are order-of-summation
    * sensitive, so this rides the driver's rows-only check; exact values
    * are pinned by GraphSpec's hand-iterated witness.
    */
  def syndicationPagerank(spark: SparkSession, dir: String): DataFrame = {
    val docSrc = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .join(docSrc.select(col("doc_id").as("doc_a"), col("source").as("src")),
            "doc_a")
      .join(docSrc.select(col("doc_id").as("doc_b"), col("source").as("dst")),
            "doc_b")
      .select(col("src"), col("dst"))
    val edges = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = docSrc.select(col("source").as("id")).distinct()
    pageRank(nodes, edges)
      .select(col("id").as("source"), col("rank"))
      .orderBy(col("rank").desc, col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "syndication_pagerank" -> syndicationPagerank _)

  /** Float ranks (order-of-summation sensitive) — no SQL oracle; the
    * driver records the rows-only check and GraphSpec carries the exact
    * witness. */
  val oracles: Map[String, String] = Map.empty
}
