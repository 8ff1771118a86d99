package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.Opq]]'s contract: the signed-Hadamard matrix really is
  * orthogonal (so ADC distances are basis-invariant), the rotation is
  * a map-only projection (no shuffle before the subspace split), and
  * recall@3 is MEASURED beside the un-rotated chain — the X10b
  * practice for every approximate rung. */
class OpqSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("the sign matrix is orthogonal: R·Rᵀ = 64·I before the 1/8 scales") {
    val rows = (0 until 64).map(ext.Opq.signRow)
    for (a <- 0 until 64; b <- a until 64) {
      val dot = (0 until 64).map(j => rows(a)(j) * rows(b)(j)).sum
      val expect = if (a == b) 64.0 else 0.0
      assert(dot == expect, s"row $a · row $b = $dot")
    }
  }

  test("rotation preserves squared L2 distances (orthogonality end to end)") {
    CacheScope.scoped(spark) {
      val vecs = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), ext.Vectors.asDouble(col("embedding")).as("v"))
        .filter(col("vec_id") < 20)
      val raw = vecs.collect().map(r =>
        r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val rot = vecs.select(col("vec_id"), ext.Opq.rotate(col("v")).as("v"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      def d2(x: Array[Double], y: Array[Double]): Double =
        x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
      for (a <- raw.keys; b <- raw.keys if a < b) {
        val before = d2(raw(a), raw(b))
        val after = d2(rot(a), rot(b))
        assert(math.abs(before - after) <= 1e-9 * math.max(1.0, before),
               s"distance not preserved for ($a, $b): $before vs $after")
      }
    }
  }

  test("the rotation projection is map-only — no exchange, no generator") {
    val plan = CacheScope.scoped(spark) {
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), ext.Vectors.asDouble(col("embedding")).as("v0"))
        .select(col("vec_id"), ext.Opq.rotate(col("v0")).as("v"))
        .queryExecution.sparkPlan.toString
    }
    assert(!plan.contains("Exchange"), "rotation must not shuffle")
    assert(!plan.contains("Generate"),
           "rotation must not explode rows — one projection per vector")
  }

  test("recall@3 measured beside the un-rotated chain") {
    def top3(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.map(r => r.getLong(0) -> r.getLong(2)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    val brute = CacheScope.scoped(spark) {
      top3(ext.Similarity.knnBrute(spark, sfDir).collect())
    }
    val pq = CacheScope.scoped(spark) {
      top3(ext.Pq.knnPq(spark, sfDir).collect())
    }
    val opq = CacheScope.scoped(spark) {
      top3(ext.Opq.knnOpq(spark, sfDir).collect())
    }
    assert(opq.keySet == brute.keySet)
    def recall(got: Map[Long, Set[Long]]): Double =
      got.map { case (q, s) =>
        (s intersect brute(q)).size.toDouble / brute(q).size
      }.sum / got.size
    val (rPq, rOpq) = (recall(pq), recall(opq))
    info(f"recall@3 vs brute — PQ: $rPq%.2f, OPQ: $rOpq%.2f")
    // the pin is the measurement plus a floor, not a production
    // figure: on diffuse synthetic embeddings the rotation is
    // near-neutral (Ge et al.'s gain needs correlated dims)
    assert(rOpq > 0.0, s"rotated ADC search found no true neighbors: $rOpq")
  }
}
