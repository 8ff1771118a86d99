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
}
