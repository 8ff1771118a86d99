package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

/** Property form of the SHARED banded Hamming pairing
  * ([[ext.Dedup.bandedHammingPairs]] — the one join both the simhash
  * and the mm_dedup pairings ride): over generated signature sets the
  * banded join must return EXACTLY the all-pairs set filtered by
  * (shares ≥ 1 of the 4 16-bit bands) ∧ (Hamming ≤ max) — no
  * candidate lost by the banding, none invented, every reported
  * Hamming distance exact. The generator plants clustered signatures
  * (small perturbations of anchors) so the ≤-max band survives real
  * hits, not just the vacuous empty set. */
object BandPairProps extends Properties("graft.bandpairs") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark

  private val sigSetGen: Gen[Seq[(Long, Long)]] = for {
    nAnchors <- Gen.choose(1, 4)
    anchors  <- Gen.listOfN(nAnchors, Gen.long)
    nDocs    <- Gen.choose(2, 24)
    sigs     <- Gen.listOfN(nDocs, for {
                  a     <- Gen.oneOf(anchors)
                  flips <- Gen.choose(0, 12)
                  bits  <- Gen.listOfN(flips, Gen.choose(0, 63))
                } yield bits.foldLeft(a)((s, b) => s ^ (1L << b)))
  } yield sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }

  private def reference(sigs: Seq[(Long, Long)],
                        hMax: Int): Set[(Long, Long, Int)] =
    (for {
      (ida, sa) <- sigs
      (idb, sb) <- sigs
      if ida < idb
      if (0 until 4).exists(b => ((sa >> (16 * b)) & 0xFFFFL) ==
                                 ((sb >> (16 * b)) & 0xFFFFL))
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= hMax
    } yield (ida, idb, h)).toSet

  property("banded join ≡ all-pairs band∧Hamming filter") =
    forAll(sigSetGen, Gen.choose(0, 16)) { (sigs, hMax) =>
      import spark.implicits._
      val got = CacheScope.scoped(spark) {
        ext.Dedup.bandedHammingPairs(sigs.toDF("doc_id", "sig"), hMax)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      }
      got == reference(sigs, hMax)
    }
}
