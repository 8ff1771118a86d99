package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Cdc.cdcMerge]] semantics the gate's value-compare can't
  * see on its own: tombstone precedence, idempotence, and the shard-
  * packing overshoot bound for [[graft.ext.Corpus.packShards]]. */
class CdcSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def merge(base: Seq[(Long, Long, String, Double)],
                    changes: Seq[(Long, Long, String, Double)]) =
    ops.Cdc.cdcMerge(
        base.toDF("k", "ver", "op", "v"),
        changes.toDF("k", "ver", "op", "v"),
        Seq("k"), Seq(col("ver").desc), col("op") === "D")
      .select("k", "ver", "v").as[(Long, Long, Double)]
      .collect().sortBy(_._1).toSeq

  test("latest version wins; tombstones delete; older deletes lose") {
    val base = Seq(
      (1L, 10L, "U", 1.0),   // updated in changes
      (2L, 10L, "U", 2.0),   // deleted in changes
      (3L, 10L, "U", 3.0),   // untouched
      (4L, 10L, "D", 0.0))   // base-side tombstone, resurrected later
    val changes = Seq(
      (1L, 20L, "U", 1.5),
      (2L, 20L, "D", 0.0),
      (4L, 20L, "U", 4.0),   // newer than the tombstone -> key lives
      (5L, 20L, "U", 5.0))   // brand-new key
    assert(merge(base, changes) === Seq(
      (1L, 20L, 1.5), (3L, 10L, 3.0), (4L, 20L, 4.0), (5L, 20L, 5.0)))
  }

  test("merge is idempotent: folding the changes twice changes nothing") {
    val base = Seq((1L, 10L, "U", 1.0), (2L, 10L, "U", 2.0))
    val changes = Seq((1L, 20L, "U", 1.5), (2L, 20L, "D", 0.0))
    val once = merge(base, changes)
    assert(merge(once.map { case (k, ver, v) => (k, ver, "U", v) }, changes)
             === once)
  }

  test("pack_shards: per-shard token mass < budget + largest doc") {
    val df = ext.Corpus.packShards(spark, sfDir).cache()
    val maxDoc = df.agg(max("n_tokens")).as[Long].head()
    val overs = df.groupBy("worker", "shard_id")
      .agg(sum("n_tokens").as("tok"))
      .filter(col("tok") >= lit(2000L) + lit(maxDoc)).count()
    assert(overs === 0)
    // shards are contiguous: within a worker, shard_id is non-decreasing
    // in doc order and starts at 0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("worker").orderBy("doc_id")
    assert(df.withColumn("prev", lag(col("shard_id"), 1).over(w))
             .filter(col("prev") > col("shard_id")).count() === 0)
    assert(df.groupBy("worker").agg(min("shard_id").as("m"))
             .filter(col("m") =!= 0).count() === 0)
    df.unpersist()
  }
}
