package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** Semantics of the dedup family's tuning dials at non-default values —
  * each dial must behave as a pure threshold/width, never change the
  * candidate generation it filters:
  *
  *  - jaccardMin / hammingMax: loosening the verify threshold can only
  *    ADD pairs, and the default-threshold result must be exactly the
  *    loosened result re-filtered (the dial is a post-candidate filter).
  *  - blockW: widening the sorted-neighborhood block can only improve
  *    (or preserve) each vector's reported nearest neighbor — the
  *    candidate set grows monotonically with the block width.
  */
class DedupDialSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("jaccardMin is a pure post-candidate threshold") {
    val all = Dedup.dedupMinhashLsh(spark, sfDir, jaccardMin = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val default = Dedup.dedupMinhashLsh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(all.length >= default.length)
    assert(all.filter(_._3 >= 0.5).toSeq === default.toSeq)
  }

  test("hammingMax is a pure post-candidate threshold") {
    val all = Dedup.dedupSimhashPairs(spark, sfDir, hammingMax = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val default = Dedup.dedupSimhashPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(all.length >= default.length)
    assert(all.filter(_._3 <= 10).toSeq === default.toSeq)
  }

  test("widening blockW never worsens a reported nearest neighbor") {
    def best(blockW: Int): Map[Long, Double] =
      Dedup.dedupEmbedding(spark, sfDir, blockW = blockW)
        .select("vec_id", "cosine").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val narrow = best(8)
    val wide   = best(64)
    assert(narrow.keySet === wide.keySet) // every vector still reports
    // wider blocks ⊇ narrower candidate sets per vector → the best
    // cosine can only go up
    narrow.foreach { case (id, c) =>
      assert(wide(id) >= c - 1e-12, s"vec $id regressed: $c -> ${wide(id)}")
    }
  }
}
