package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** Edge semantics of the 64-bit SimHash pairing that the gate corpus
  * never exercises (its docs carry 6–31 distinct tokens): the no-twin
  * floor (< 5 distinct tokens plants no near-dup twin), the
  * distinct-token contract ceiling (> 255 → the doc is excluded
  * outright), and recoverability of planted twins through the banded
  * Hamming join. Everything here is deterministic — signatures are md5
  * of fixed texts — so the assertions pin exact behavior, not a
  * distribution. */
class SimhashPairsEdgeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // Six long docs (120 distinct tokens: expected twin Hamming ≈
  // 64·√(2/120π) ≈ 5, far under the 10 cut), one 4-distinct-token doc,
  // one 300-distinct-token doc. Disjoint per-doc vocabularies keep the
  // texts distinct; the content-digest salt diversifies the signatures
  // regardless.
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_simpair").toString
    def words(doc: Int, n: Int) = (0 until n).map(i => s"w${doc}_$i").mkString(" ")
    ((0 until 6).map(i => (i.toLong, words(i, 120), "en", "unit", 1L)) ++ Seq(
      (6L, "a b c d", "en", "unit", 1L),
      (7L, words(7, 300), "en", "unit", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("planted twins pair with their source; short docs plant no twin; wide docs are excluded") {
    val pairs = Dedup.dedupSimhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // every emitted pair is a planted (twin −id−1, base id) mirror of the
    // SAME doc — unrelated salted docs must never clear the Hamming cut
    assert(pairs.forall { case (a, b, _) => a == -b - 1 },
      s"only twin↔source pairs may survive: $pairs")
    assert(pairs.forall(_._3 <= 10), s"Hamming cut violated: $pairs")
    // banding recovers planted twins (a twin whose ~5 bit flips hit all
    // 4 bands would be missed — deterministic per text; most must land)
    assert(pairs.size >= 3, s"banding lost too many planted twins: $pairs")
    // the 4-distinct-token doc plants no twin
    assert(!pairs.exists { case (a, b, _) => a == -7L || b == 6L },
      s"4-token doc must not plant a twin: $pairs")
    // the >255-distinct-token doc is outside the contract entirely
    assert(!pairs.exists { case (a, b, _) => a == -8L || b == 7L },
      s">255-distinct-token doc must be excluded: $pairs")
  }
}
