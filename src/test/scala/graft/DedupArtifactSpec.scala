package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** The claim at Dedup.minhashSignatures — "in production this table is
  * computed once at ingest and persisted; the probe side then never
  * touches the texts" — exercised literally: signatures go to parquet,
  * are read back in a fresh DataFrame, and [[Dedup.lshCandidates]]
  * generates pairs from the STORED table alone. The result must contain
  * every verified near-dup pair the text-derived end-to-end query finds
  * (candidates ⊇ verified pairs), and its plan must stay bucket-joined. */
class DedupArtifactSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("LSH probe over the persisted signature artifact finds every verified pair") {
    val sigPath = Files.createTempDirectory("graft_lsh_sig").toString
    Dedup.minhashSignatures(spark, sfDir).write.mode("overwrite").parquet(sigPath)

    val stored = spark.read.parquet(sigPath) // texts are out of reach here
    val cand = Dedup.lshCandidates(stored)
    assert(cand.columns.toSeq === Seq("doc_a", "doc_b"))
    val candSet = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val verified = Dedup.dedupMinhashLsh(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty, "fixture must contain near-dup pairs")
    assert(verified.subsetOf(candSet),
      s"stored-artifact probe missed verified pairs: ${verified -- candSet}")

    val plan = cand.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("CacheScope.scoped releases every internal dedup pin — CacheManager empty") {
    // The cache-ownership contract, enforced: a library caller composing
    // dedup plans inside CacheScope.scoped must leave the session with
    // ZERO cached frames — no clearCache() folklore required. A new
    // persist added anywhere in the family without a CacheScope.pin
    // fails here, not in review.
    CacheScope.release(spark)
    spark.catalog.clearCache() // isolate from earlier suites' leftovers
    CacheScope.scoped(spark) {
      // the heaviest pinners: LSH verify (sh + bands + build side) and
      // the simhash signature path
      Dedup.dedupMinhashLsh(spark, sfDir).write.format("noop")
        .mode("overwrite").save()
      Dedup.dedupSimhashPairs(spark, sfDir).write.format("noop")
        .mode("overwrite").save()
      assert(CacheScope.livePinned(spark) > 0,
        "expected the dedup family to pin caches inside the scope")
    }
    assert(CacheScope.livePinned(spark) === 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "scoped dedup run left frames in the session CacheManager")
  }
}
