package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** Short-document edge cases the gate corpus never exercises (every gate
  * doc has ≥ 3 tokens): a doc with fewer than 3 tokens has an EMPTY
  * shingle set, and its MinHash bands must be NULL — never a shared
  * constant. A constant band key would bucket every short doc of a
  * corpus together and regrow the all-pairs blowup the banded design
  * exists to avoid (null keys never equi-join). Regression for the
  * signature build's explode_outer + min-aggregate path: the short doc's
  * single NULL shingle row must survive to the groupBy (explode would
  * drop it) and hash to NULL, never to a constant. */
class ShortDocSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_shortdoc").toString
    Seq(
      (0L, "one", "en", "unit", 3L),
      (1L, "two words", "en", "unit", 9L),
      (2L, "three tokens here", "en", "unit", 17L),
      (3L, "a proper document with enough tokens to shingle", "en", "unit", 47L),
      (4L, "a proper document with enough tokens to shingle", "en", "unit", 47L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("short docs get NULL bands, not a shared constant key") {
    val sigs = Dedup.minhashSignatures(spark, dir)
      .collect().map(r => r.getLong(0) -> (0 until 4).map(b => r.isNullAt(b + 1)))
      .toMap
    assert(sigs(0L) === Seq(true, true, true, true), "1-token doc must have null bands")
    assert(sigs(1L) === Seq(true, true, true, true), "2-token doc must have null bands")
    assert(sigs(2L) === Seq(false, false, false, false))
    assert(sigs(3L) === Seq(false, false, false, false))
  }

  test("short docs never become LSH candidates; true dups still pair") {
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((3L, 4L)),
      "exactly the identical-doc pair; null-band short docs must not join")
  }
}
