package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

/** The IVF recall contract — the number every production ANN user asks
  * for before trading probes against cost.
  *
  * recall@k of a probe strategy = |reported top-k ∩ exact top-k| / k,
  * averaged over the query set, with `knn_brute` as the exact baseline
  * (its candidate set is the whole corpus). Two properties are pinned:
  *
  *  - multi-probe recall ≥ single-probe recall. knn_ivf_probe2's probe
  *    set is the top-2 centroid-ranked cells UNIONED with the query's
  *    own cell, so its candidate set is a strict superset of knn_ivf's;
  *    any exact-top-k member that survives single-probe ranking also
  *    survives the superset's (at most k−1 candidates can outrank it
  *    anywhere). The assertion would catch a regression that broke the
  *    superset construction.
  *  - both recalls are reported (info), so the round artifact carries
  *    the measured tradeoff, not just the inequality.
  */
class SimilarityRecallSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def topNeighbors(name: String): Map[Long, Set[Long]] =
    Similarity.queries(name)(spark, sfDir)
      .select("query_id", "nn_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  test("knn_ivf_probe2 recall@3 vs knn_brute is >= single-probe knn_ivf's") {
    val exact  = topNeighbors("knn_brute")
    val single = topNeighbors("knn_ivf")
    val multi  = topNeighbors("knn_ivf_probe2")

    def recallAtK(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).count(truth).toDouble / truth.size
      }
      per.sum / per.size
    }

    val rSingle = recallAtK(single)
    val rMulti  = recallAtK(multi)
    info(f"recall@3 single-probe (knn_ivf)        = $rSingle%.4f")
    info(f"recall@3 multi-probe  (knn_ivf_probe2) = $rMulti%.4f")

    assert(exact.nonEmpty, "brute-force baseline returned no queries")
    assert(rMulti >= rSingle,
      s"multi-probe recall $rMulti fell below single-probe $rSingle — " +
      "the probe-superset construction is broken")
    assert(rMulti > 0.0)
  }

  test("int8-quantized ANN (asymmetric ADC) keeps recall@3 near exact") {
    val exact = topNeighbors("knn_brute")
    val quant = Similarity.knnQuantized(spark, sfDir)
      .select("query_id", "nn_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val per = exact.map { case (q, truth) =>
      quant.getOrElse(q, Set.empty).count(truth).toDouble / truth.size }
    val recall = per.sum / per.size
    info(f"recall@3 int8-quantized (knn_quantized) = $recall%.4f")
    // 256 levels per dimension: reconstruction error ≪ inter-neighbor
    // cosine gaps — recall should be near-perfect, 0.8 is the alarm line
    assert(recall >= 0.8, f"quantized recall collapsed: $recall%.4f")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("probe dial endpoints: 0 extra cells ≡ single-probe, all cells ≡ brute") {
    // probeCells = 0 leaves only the query's own cell — exactly knn_ivf's
    // candidate set, so the outputs must match row-for-row
    assert(rows(Similarity.knnIvfProbe2(spark, sfDir, probeCells = 0)) ===
           rows(Similarity.knnIvf(spark, sfDir)))
    // probing every cell makes the candidate set the whole corpus —
    // exactly knn_brute. Together the endpoints pin the dial's semantics:
    // single-probe recall at 0, exact recall at n_cells.
    assert(rows(Similarity.knnIvfProbe2(spark, sfDir, probeCells = 1000)) ===
           rows(Similarity.knnBrute(spark, sfDir)))
  }
}
