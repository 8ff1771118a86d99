package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the streaming VECTOR ingest contract ([[stream.IngestVecDedup]]
  * + [[ext.EmbHistory]]) — the modality that completes the streaming
  * dedup ladder (exact text / near-dup text / vectors):
  *
  *  - artifact round trip: write → read → probe ≡ the self-contained
  *    batch gate ([[ext.Dedup.dedupEmbIncremental]]) on the same split
  *    (which also pins the `dedup_emb_probe` gate, same code path);
  *  - the STREAM over the new split — several uneven micro-batches —
  *    lands exactly the batch manifest, each vector exactly once, AND
  *    appends exactly the kept vectors' IVF-PQ codes under the frozen
  *    codebooks into the cell-partitioned layout;
  *  - [[ext.IvfPq.compactCodes]] over the fragmented per-batch appends
  *    is content-identical (the maintenance op the streaming appends
  *    rely on);
  *  - the streaming plan is STATELESS (no StateStore operators —
  *    history lives in artifacts, not state) and the per-batch
  *    ephemeral pins are all released (a soak must not accumulate
  *    session pins or persistent RDDs across hundreds of batches);
  *  - the artifact probe plan never re-shuffles the history side
  *    (no sort-merge join) and never cartesian-explodes.
  */
class IngestVecDedupSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def run[T](body: => T): T = CacheScope.scoped(spark)(body)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val isNew = col("vec_id") % 5 === 0

  private def vecs() = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), ext.Vectors.asDouble(col("embedding")).as("v"))

  private def batchManifest(): Seq[(Long, Long, Option[Long], Boolean)] =
    ext.Dedup.dedupEmbIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
                 if (r.isNullAt(2)) None else Some(r.getLong(2)),
                 r.getBoolean(3))).toSeq

  test("persisted artifacts probe ≡ the self-contained batch gate") {
    val dir = tmp("graft-veh")
    run { ext.EmbHistory.write(vecs().filter(!isNew), dir) }
    val expected = run(batchManifest())
    assert(expected.exists(!_._4), "no cross-split near-dups — fixture broken")
    val viaDisk = run {
      val hist = ext.EmbHistory.read(spark, dir)
      Present.sorted(
        ext.EmbHistory.probe(
          CacheScope.pin(ext.EmbHistory.withNorm(vecs().filter(isNew))),
          hist),
        col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
                   if (r.isNullAt(2)) None else Some(r.getLong(2)),
                   r.getBoolean(3))).toSeq
    }
    assert(viaDisk == expected, "persisted-artifact probe ≠ batch gate")
  }

  test("stream ≡ batch manifest + kept codes appended; stateless; pins released") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

    val artDir = tmp("graft-veh-art")
    run { ext.EmbHistory.write(vecs().filter(!isNew), artDir) }
    val newVecs = vecs().filter(isNew).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    assert(newVecs.size >= 4, "new split too small to micro-batch")

    val pinsBefore = CacheScope.livePinned(spark)
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    val outDir = tmp("graft-veh-out")
    val hist = ext.EmbHistory.read(spark, artDir)
    val input = MemoryStream[(Long, Seq[Double])]
    val q = stream.IngestVecDedup.manifestSink(
        input.toDF().toDF("vec_id", "v"), hist,
        s"$outDir/manifest", s"$outDir/index/codes", s"$outDir/ckpt")
      .start()
    try {
      // three uneven micro-batches — batch boundaries must not change
      // the manifest (each vector probes history independently)
      val (a, rest) = newVecs.splitAt(newVecs.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      assert(q.lastProgress.stateOperators.isEmpty,
             "vector ingest must be stateless — history is artifacts, not state")
    } finally q.stop()

    assert(CacheScope.livePinned(spark) == pinsBefore,
           "streaming sink leaked session-scoped pins")
    // `<=`, not `==`: the artifact build's Lloyd loops leave locally-
    // checkpointed RDDs that the ContextCleaner reaps asynchronously,
    // so the count can legitimately FALL during the stream — the
    // contract is that the sink never GROWS it
    assert(spark.sparkContext.getPersistentRDDs.size <= rddsBefore,
           "streaming sink leaked persisted RDDs across batches")

    val streamed = spark.read.parquet(s"$outDir/manifest")
    assert(streamed.select("batch_id").distinct().count() == 3,
           "expected one manifest slice per micro-batch")
    val got = streamed.select("vec_id", "n_dups", "dup_of", "kept")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
                 if (r.isNullAt(2)) None else Some(r.getLong(2)),
                 r.getBoolean(3))).toSeq.sortBy(_._1)
    val expected = run(batchManifest())
    assert(got == expected, "stream manifest ≠ batch dedupEmbIncremental")

    // the second output: exactly the KEPT vectors' codes, encoded under
    // the frozen codebooks — the batch-side witness is one encode pass
    // over the kept split
    val keptIds = expected.filter(_._4).map(_._1).toSet
    def codeRows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "ivf_cell", "sub", "code").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    // materialized BEFORE compaction replaces the files underneath
    val streamedCodeRows = codeRows(
      spark.read.parquet(s"$outDir/index/codes")
        .select(col("vec_id"), col("ivf_cell").cast("long").as("ivf_cell"),
                col("sub"), col("code")))
    assert(streamedCodeRows.map(_._1).toSet == keptIds,
           "appended codes are not exactly the kept vectors")
    val witness = run {
      ext.IvfPq.encode(
        vecs().filter(isNew).filter(col("vec_id").isInCollection(keptIds)),
        hist.coarse, hist.codebooks)
    }
    assert(streamedCodeRows == codeRows(witness),
           "streamed codes ≠ batch encode under the frozen codebooks")

    // compaction over the fragmented per-batch appends is
    // content-identical — the maintenance op the appends rely on
    ext.IvfPq.compactCodes(spark, s"$outDir/index")
    val compacted = spark.read.parquet(s"$outDir/index/codes")
      .select(col("vec_id"), col("ivf_cell").cast("long").as("ivf_cell"),
              col("sub"), col("code"))
    assert(codeRows(compacted) == streamedCodeRows,
           "compaction changed the code content")
  }

  test("artifact probe plan: hash joins only, no history re-shuffle, no cartesian") {
    val dir = tmp("graft-veh-plan")
    run {
      ext.EmbHistory.write(vecs().filter(!isNew), dir)
      val hist = ext.EmbHistory.read(spark, dir)
      val plan = ext.EmbHistory.probe(
          CacheScope.pin(ext.EmbHistory.withNorm(vecs().filter(isNew))),
          hist)
        .queryExecution.sparkPlan.toString
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

  test("replayed micro-batch is idempotent: manifest and codes unchanged") {
    // foreachBatch is at-least-once — a restart between the manifest and
    // codes writes replays the batch. The r21 batch-keyed dynamic
    // partition overwrites must make that replay a no-op (r20 ADVICE:
    // the old append duplicated manifest rows and double-appended codes
    // into the searchable index).
    val artDir = tmp("graft-veh-replay-art")
    run { ext.EmbHistory.write(vecs().filter(!isNew), artDir) }
    val outDir = tmp("graft-veh-replay-out")
    run {
      val hist = ext.EmbHistory.read(spark, artDir)
      val batch = vecs().filter(isNew)
      def snap(): (Seq[Row], Seq[Row]) = (
        spark.read.parquet(s"$outDir/manifest")
          .select("vec_id", "n_dups", "dup_of", "kept", "batch_id")
          .collect().toSeq.sortBy(_.getLong(0)),
        spark.read.parquet(s"$outDir/index/codes")
          .select(col("vec_id"), col("sub"), col("code"),
                  col("ivf_cell").cast("long"), col("batch_id").cast("long"))
          .collect().toSeq
          .sortBy(r => (r.getLong(0), r.getLong(1))))
      stream.IngestVecDedup.processBatch(batch, 7L, hist,
        s"$outDir/manifest", s"$outDir/index/codes", 2, 0.3)
      val first = snap()
      assert(first._1.nonEmpty && first._2.nonEmpty, "batch wrote nothing")
      // the replay: same content, same batch id — the at-least-once case
      stream.IngestVecDedup.processBatch(batch, 7L, hist,
        s"$outDir/manifest", s"$outDir/index/codes", 2, 0.3)
      val second = snap()
      assert(second._1 == first._1,
             "replayed batch duplicated or changed manifest rows")
      assert(second._2 == first._2,
             "replayed batch duplicated or changed code rows")
    }
  }
}
