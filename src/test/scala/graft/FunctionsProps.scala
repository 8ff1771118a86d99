package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

/** Property form of FunctionsSpec: over GENERATED inputs, the native
  * expressions must be bit-identical to the composable built-in forms
  * they replaced — the oracle parity of every cosine/Jaccard gate query
  * reduces to exactly this equivalence. */
object FunctionsProps extends Properties("graft.functions") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val doubleGen: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e6, 1e6),
    Gen.choose(-1.0, 1.0),
    Gen.oneOf(0.0, -0.0, 1e-300, 1e300))

  // equal-length pairs (the embedding case) and ragged pairs (null case)
  private val vecPairGen: Gen[(Seq[Double], Seq[Double])] = for {
    n  <- Gen.choose(0, 96)
    a  <- Gen.listOfN(n, doubleGen)
    b  <- Gen.listOfN(n, doubleGen)
    ragged <- Gen.oneOf(true, false)
    extra  <- Gen.listOfN(1, doubleGen)
  } yield if (ragged) (a, b ++ extra) else (a, b)

  property("array_dot == aggregate(zip_with) bit-for-bit") =
    forAll(Gen.nonEmptyListOf(vecPairGen)) { pairs =>
      import spark.implicits._
      val fold = aggregate(
        zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, p) => s + p)
      pairs.toDF("a", "b")
        .select(graft.functions.ArrayDot(col("a"), col("b")).as("fused"),
                fold.as("fold"))
        .collect().forall { r =>
          (r.isNullAt(0) && r.isNullAt(1)) ||
            (!r.isNullAt(0) && !r.isNullAt(1) &&
              java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
                java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
        }
    }

  private val tokenGen: Gen[String] =
    Gen.chooseNum(0, 40).map(i => s"w$i") // small vocab → real overlaps/dups

  private val strPairGen: Gen[(Seq[String], Seq[String])] = for {
    a <- Gen.listOf(tokenGen)
    b <- Gen.listOf(tokenGen)
  } yield (a, b)

  property("jaccard_sim == size(intersect)/size(union) bit-for-bit") =
    forAll(Gen.nonEmptyListOf(strPairGen)) { pairs0 =>
      import spark.implicits._
      // both-empty is the documented deviation: the composed form under
      // ANSI throws DIVIDE_BY_ZERO, the fused form is total (NaN) —
      // asserted separately below; excluded from the equivalence set
      val pairs = pairs0.filterNot(p => p._1.isEmpty && p._2.isEmpty)
      val composed = size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b")))
      pairs.isEmpty || pairs.toDF("a", "b")
        .select(graft.functions.JaccardSim(col("a"), col("b")).as("fused"),
                composed.as("comp"))
        .collect().forall { r =>
          java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(1))
        }
    }

  property("jaccard_sim is total: empty∪empty → NaN, not an ANSI error") =
    forAll(Gen.const(())) { _ =>
      import spark.implicits._
      Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
        .select(graft.functions.JaccardSim(col("a"), col("b")))
        .collect()(0).getDouble(0).isNaN
    }
}
