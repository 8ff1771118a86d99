package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.Pq]]'s defining property: the jointly-trained grouped
  * loop is EXACTLY M independent [[ext.KMeans]] trainings over the
  * sliced subvectors — no cross-subspace leakage through the shared
  * jobs. */
class PqSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("grouped PQ training ≡ per-subspace k-means on the slices") {
    val (m, k, rounds) = (4, 8, 3)
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), ext.Vectors.asDouble(col("embedding")).as("v"))
    val joint = CacheScope.scoped(spark) {
      ext.Pq.pqTrainFrame(vecs, m, k, rounds).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
                  (r.getLong(3), r.getLong(4))).toMap
    }
    val d = vecs.select(size(col("v"))).head.getInt(0) / m
    (0 until m).foreach { sub =>
      val solo = CacheScope.scoped(spark) {
        ext.KMeans.kmeansFrame(
          vecs.select(col("vec_id"),
            slice(col("v"), sub * d + 1, d).as("v")), k, rounds)
          .collect()
          .map(r => (sub.toLong, r.getLong(0), r.getLong(1)) ->
                    (r.getLong(2), r.getLong(3))).toMap
      }
      solo.foreach { case (key, v) =>
        assert(joint.get(key).contains(v), s"mismatch at $key")
      }
      assert(joint.count(_._1._1 == sub) == solo.size)
    }
  }

  test("ADC search recall@3 vs exact brute force is measured and positive") {
    val brute = CacheScope.scoped(spark) {
      ext.Similarity.knnBrute(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(2))
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = CacheScope.scoped(spark) {
      ext.Pq.knnPq(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(2))
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(pq.keySet == brute.keySet)
    val recall = pq.map { case (q, got) =>
      (got intersect brute(q)).size.toDouble / brute(q).size
    }.sum / pq.size
    info(f"PQ ADC recall@3 vs brute: $recall%.2f")
    // cosine-vs-L2 metric mismatch plus 4×3-bit compression on diffuse
    // synthetic vectors: the pin is that the probe FINDS true
    // neighbors at all, not a production recall figure (X10b practice:
    // measure honestly, assert the floor)
    assert(recall > 0.0, s"ADC search found no true neighbors: $recall")
  }

  test("codes are within range and every (vector, subspace) gets exactly one") {
    val n = Tables.embeddings(spark, sfDir).count()
    val codes = CacheScope.scoped(spark) {
      ext.Pq.pqAssign(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    assert(codes.length == n * 4)
    assert(codes.map(c => (c._1, c._2)).distinct.length == codes.length)
    assert(codes.forall(c => c._3 >= 0 && c._3 < 8))
  }
}
