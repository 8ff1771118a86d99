package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

/** Property form of BpeSpec (the NGramsProps precedent): over generated
  * texts and merge lists — including degenerate pairs, unicode symbols,
  * and merges that can chain across ranks — the native
  * [[functions.BpeEncode]] must behave as a SEGMENTER, never a mutator,
  * and must agree with a straightforward Scala reference
  * implementation of rank-ordered non-overlapping merging. */
object BpeProps extends Properties("graft.bpe") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "é", "中", "😀"))
      .map(_.take(6).mkString)
  private val textGen: Gen[String] =
    Gen.listOf(wordGen).map(_.take(8).mkString(" "))
  private val mergeGen: Gen[Seq[String]] = for {
    n  <- Gen.choose(0, 6)
    ms <- Gen.listOfN(n, for {
            a <- Gen.oneOf("a", "b", "c", "ab", "bc", "é", "中")
            b <- Gen.oneOf("a", "b", "c", "ab", "bc", "é", "😀")
          } yield s"$a $b")
  } yield ms

  private def encode(text: String, merges: Seq[String]): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(functions.BpeEncode(col("text"),
        array(merges.map(lit): _*).cast("array<string>")).as("t"))
      .head.getSeq[String](0)
  }

  /** Reference: code-point symbols per word, merges applied in rank
    * order, one left-to-right non-overlapping pass each. */
  private def reference(text: String, merges: Seq[String]): Seq[String] =
    text.split(" ", -1).filter(_.nonEmpty).toSeq.flatMap { w =>
      var syms = w.codePoints().toArray.toSeq.map(Character.toString)
      merges.foreach { m =>
        val Array(a, b) = m.split(" ", 2)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toSeq
      }
      syms
    }

  property("native encode equals the reference implementation") =
    forAll(textGen, mergeGen) { (t, ms) =>
      encode(t, ms) == reference(t, ms)
    }

  property("segmentation identity: tokens concatenate back to the words") =
    forAll(textGen, mergeGen) { (t, ms) =>
      encode(t, ms).mkString == t.split(" ", -1).filter(_.nonEmpty).mkString
    }
}
