package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

/** The executable decode swap path: the partition-batched decoder
  * (mapPartitions — where a real codec plugs in) must agree bit-for-bit
  * with the codegen'd expression stub the gate verifies, and must run
  * partition-parallel without reshuffling its input. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("mapPartitions decode path matches the expression stub exactly") {
    val media = Multimodal.media(spark, sfDir)
    val viaPartitions = Multimodal.decodePartitions(media)
      .collect().map(d => d.doc_id -> d.decoded_mean_luma).toMap
    val viaExpr = Multimodal.mmFeatures(spark, sfDir)
      .select(col("doc_id"), col("decoded_mean_luma"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaPartitions === viaExpr)
    assert(viaPartitions.nonEmpty)
  }

  test("decode keeps the input partitioning — no shuffle before the decoder") {
    val media = Multimodal.media(spark, sfDir).repartition(7)
    val ds = Multimodal.decodePartitions(media)
    assert(ds.rdd.getNumPartitions === 7)
    assert(!ds.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
           "decoder input must not be reshuffled")
  }

  test("mm_dedup pairs via ONE banded self-join — no cartesian, no " +
       "second join, and every planted twin is recovered") {
    CacheScope.scoped(spark) {
      val df = Multimodal.mmDedup(spark, sfDir)
      val plan = df.queryExecution.sparkPlan.toString
      // the banded Hamming pairing is a single equi-join on (band_id,
      // bkey); the Hamming verify rides the join output as a per-row
      // expression, never a join-back of the signature table
      assert("(?i)join".r.findAllIn(plan).size ==
               "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
                 .findAllIn(plan).size,
             s"unexpected join kinds:\n$plan")
      assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
               .findAllIn(plan).size == 1,
             s"banded pairing must be ONE join node:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
             !plan.contains("BroadcastNestedLoopJoin"), plan)
      // recovery: each doc's planted twin (−doc_id − 1 < 0 < doc_id ⇒
      // the twin is always doc_a under doc_a < doc_b) pairs with its
      // base at Hamming ≤ 3; unrelated signatures sit at ≈ 32 and
      // cannot leak through the radius-4 verify
      val pairs = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val n = Tables.documents(spark, sfDir).count()
      assert(pairs.length == n, s"expected one pair per doc, got ${pairs.length}")
      assert(pairs.forall { case (a, b, h) => a == -b - 1 && h <= 3 },
             "a non-twin pair leaked through the Hamming verify")
    }
  }
}
