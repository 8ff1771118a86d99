package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the streaming NEAR-dup ingest contract
  * ([[stream.IngestNearDedup]] + [[ext.DedupHistory]]):
  *
  *  - artifact round trip: write → read → probe ≡ in-memory build →
  *    probe ≡ the self-contained batch gate
  *    ([[ext.Dedup.dedupIncremental]]) on the same split;
  *  - the STREAM over the new split — several micro-batches — lands
  *    exactly the batch manifest, each doc exactly once;
  *  - the probe plan keeps the frozen-history discipline (bloom probe
  *    present, hash joins only — a sort-merge join would re-shuffle the
  *    history side — and nothing cartesian-explodes);
  *  - the streaming plan is STATELESS (no StateStore operators —
  *    history lives in artifacts, not state) and the per-batch
  *    ephemeral pins are all released (a soak must not accumulate
  *    session pins or persistent RDDs across hundreds of batches).
  */
class IngestNearDedupSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def run[T](body: => T): T = CacheScope.scoped(spark)(body)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val isNew = col("doc_id") % 5 === 0

  private def batchManifest(): Seq[(Long, Long, Option[Long], Boolean)] =
    ext.Dedup.dedupIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
                 if (r.isNullAt(2)) None else Some(r.getLong(2)),
                 r.getBoolean(3))).toSeq

  test("persisted artifacts probe ≡ in-memory build ≡ batch gate") {
    val dir = tmp("graft-ndh")
    run {
      ext.DedupHistory.write(
        Tables.documents(spark, sfDir).filter(!isNew), dir)
    }
    val expected = run(batchManifest())
    assert(expected.exists(!_._4), "no cross-split near-dups — fixture broken")
    val viaDisk = run {
      val hist = ext.DedupHistory.read(spark, dir)
      Present.sorted(
        ext.DedupHistory.probe(
          Tables.documents(spark, sfDir).filter(isNew)
            .select(col("doc_id"), col("text")), hist),
        col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
                   if (r.isNullAt(2)) None else Some(r.getLong(2)),
                   r.getBoolean(3))).toSeq
    }
    assert(viaDisk == expected, "persisted-artifact probe ≠ batch gate")
    val viaGate = run {
      ext.DedupHistory.dedupIncrementalProbe(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1),
                   if (r.isNullAt(2)) None else Some(r.getLong(2)),
                   r.getBoolean(3))).toSeq
    }
    assert(viaGate == expected, "in-plan gate probe ≠ batch gate")
  }

  test("stream over micro-batches ≡ batch manifest, stateless, pins released") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

    val artDir = tmp("graft-ndh-art")
    run {
      ext.DedupHistory.write(
        Tables.documents(spark, sfDir).filter(!isNew), artDir)
    }
    val newDocs = Tables.documents(spark, sfDir).filter(isNew)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(newDocs.size >= 4, "new split too small to micro-batch")

    val pinsBefore = CacheScope.livePinned(spark)
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    val outDir = tmp("graft-ndh-out")
    val hist = ext.DedupHistory.read(spark, artDir)
    val input = MemoryStream[(Long, String)]
    val q = stream.IngestNearDedup.manifestSink(
        input.toDF().toDF("doc_id", "text"), hist,
        s"$outDir/manifest", s"$outDir/ckpt")
      .start()
    try {
      // three uneven micro-batches — batch boundaries must not change
      // the manifest (each doc probes history independently)
      val (a, rest) = newDocs.splitAt(newDocs.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      assert(q.lastProgress.stateOperators.isEmpty,
             "near-dup ingest must be stateless — history is artifacts, not state")
    } finally q.stop()

    assert(CacheScope.livePinned(spark) == pinsBefore,
           "streaming sink leaked session-scoped pins")
    assert(spark.sparkContext.getPersistentRDDs.size == rddsBefore,
           "streaming sink leaked persisted RDDs across batches")

    val streamed = spark.read.parquet(s"$outDir/manifest")
    assert(streamed.select("batch_id").distinct().count() == 3,
           "expected one manifest slice per micro-batch")
    val got = streamed.select("doc_id", "n_dups", "dup_of", "kept")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
                 if (r.isNullAt(2)) None else Some(r.getLong(2)),
                 r.getBoolean(3))).toSeq.sortBy(_._1)
    val expected = run(batchManifest())
    assert(got == expected, "stream manifest ≠ batch dedupIncremental")
  }

  test("probe plan: bloom guard, hash joins only, no cartesian") {
    val dir = tmp("graft-ndh-plan")
    run {
      ext.DedupHistory.write(
        Tables.documents(spark, sfDir).filter(!isNew), dir)
      val hist = ext.DedupHistory.read(spark, dir)
      val plan = ext.DedupHistory.probe(
          Tables.documents(spark, sfDir).filter(isNew)
            .select(col("doc_id"), col("text")), hist)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("might_contain"),
             "bloom pre-filter missing from the probe plan")
      assert(plan.contains("BroadcastHashJoin"), plan.take(800))
      // a sort-merge join would re-shuffle (and sort) the history
      // artifact side — the exact thing the frozen-artifact contract
      // forbids; hash joins stream history through a built batch side
      assert(!plan.contains("SortMergeJoin"),
             "history side re-shuffled through a sort-merge join")
      assert(!plan.contains("CartesianProduct"),
             "probe plan cartesian-exploded")
    }
  }
}
