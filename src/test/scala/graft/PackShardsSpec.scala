package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Corpus

/** Pins [[Corpus.packShards]]' documented contract, which the value gate
  * can't distinguish from luckier packings: docs are assigned by START
  * offset (shard = ⌊start/budget⌋), so a shard's token total is bounded
  * by budget + its largest doc, and an over-budget doc pushes the NEXT
  * doc past the shards it spans (shard ids may legitimately skip — the
  * bound, not contiguity, is the contract). */
class PackShardsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_pack").toString
    // token counts 4, 3, 5, 12, 2 on one worker; budget 10 in the test:
    // starts 0,4,7,12,24 → shards 0,0,0,1,2 (the 12-token doc exceeds
    // the budget and skips nothing itself, but its successor lands in
    // shard 2 — shard boundaries fall where starts do, docs never split)
    def doc(n: Int) = (0 until n).map(i => s"t$i").mkString(" ")
    Seq(4, 3, 5, 12, 2).zipWithIndex
      .map { case (n, i) => (i.toLong * 8, doc(n), "en", "unit", n.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("start-offset assignment matches the hand-computed shard per doc") {
    val got = Corpus.packShards(spark, dir, budget = 10, workers = 1)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 8L -> 0L, 16L -> 0L, 24L -> 1L, 32L -> 2L))
  }

  test("every shard's token total stays under budget + its largest doc (gate corpus)") {
    val shards = Corpus.packShards(spark, sfDir)
      .groupBy(col("worker"), col("shard_id"))
      .agg(sum(col("n_tokens")).as("total"), max(col("n_tokens")).as("biggest"))
      .as[(Long, Long, Long, Long)].collect()
    assert(shards.nonEmpty)
    shards.foreach { case (w, s, total, biggest) =>
      assert(total < 2000 + biggest,
        s"worker $w shard $s overshoots: $total tokens, biggest doc $biggest")
    }
  }

  test("packing-efficiency report: accounting closes against the per-doc witness") {
    val perDoc = ext.Text.tokenCount(spark, sfDir)
      .select(col("bpe_tokens")).collect().map(_.getLong(0))
    val rows = Corpus.packingEfficiency(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(64L, 128L, 256L, 512L))
    rows.foreach { r =>
      val ctx = r.getLong(0)
      val (nDocs, nTok, naive, pad, packed) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // per-doc witness for the naive chunk count
      assert(nDocs == perDoc.length && nTok == perDoc.sum)
      assert(naive == perDoc.map(t => (t + ctx - 1) / ctx).sum,
        s"ctx $ctx naive chunks drifted")
      // accounting closes exactly: chunks × ctx = tokens + padding
      assert(naive * ctx == nTok + pad)
      assert(packed == (nTok + ctx - 1) / ctx)
      // packing can only help, and efficiencies are the stated ratios
      assert(packed <= naive)
      assert(r.getDouble(6) == nTok.toDouble / (naive * ctx))
      assert(r.getDouble(7) == nTok.toDouble / (packed * ctx))
    }
  }

  test("packing is a partition of the corpus: every doc exactly once") {
    val out = Corpus.packShards(spark, sfDir).select("doc_id")
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    assert(out.count() === docs.count())
    assert(out.distinct().count() === docs.count())
  }
}
