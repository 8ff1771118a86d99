package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Property form of WordNGramsSpec/CharNGramsSpec (FunctionsProps'
  * precedent): over GENERATED adversarial unicode — multi-byte code
  * points of every UTF-8 width (2/3/4 bytes), astral-plane chars,
  * leading/trailing/consecutive spaces, empty pieces, empty strings —
  * the native byte-walk expressions must equal the composed built-in
  * chains they replaced, first-occurrence order included. This is the
  * fuzzer behind the UTF-8 claims at WordNGrams.scala (an ASCII space
  * byte can never occur inside a multi-byte sequence) and
  * CharNGrams.scala (code-point positions, substr semantics). */
object NGramsProps extends Properties("graft.ngrams") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  // Alphabet chosen to attack the byte walks: every UTF-8 width, the
  // UTF-16-vs-UTF-8 order-disagreement pair (U+E000 vs U+10000), combining
  // marks, and raw space runs (empty split pieces at every boundary).
  private val pieceGen: Gen[String] = Gen.frequency(
    4 -> Gen.alphaNumStr.map(_.take(3)),
    3 -> Gen.const(" "),
    2 -> Gen.const("  "),
    1 -> Gen.const(""),
    2 -> Gen.oneOf("é", "ß", "ø"),                   // 2-byte
    2 -> Gen.oneOf("中", "", " "),        // 3-byte
    2 -> Gen.oneOf("😀", new String(Character.toChars(0x10000)), "𝛑"), // 4-byte
    1 -> Gen.const("é"),                       // combining mark
    1 -> Gen.const("\t"))                            // non-space whitespace

  private val textGen: Gen[String] =
    Gen.listOf(pieceGen).map(_.mkString)

  private val nGen: Gen[Int] = Gen.choose(2, 4)

  /** The composed chain [[graft.ext.Dedup.shingles]] used before
    * word_ngrams existed, generalized to n. */
  private def composedWord(n: Int): Column = {
    val t = split(col("text"), " ")
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + lit(j))): _*))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Code-point n-grams via substr — the semantics CharNGrams documents
    * (astral chars are ONE position, matching substring in Spark SQL and
    * DuckDB), generalized to n. */
  private def composedChar(n: Int): Column =
    when(length(col("text")) >= n,
      array_distinct(transform(sequence(lit(1), length(col("text")) - (n - 1)),
        i => col("text").substr(i, lit(n)))))
      .otherwise(array(col("text")))

  private def allEqual(texts: List[String], fused: Column, comp: Column): Boolean = {
    import spark.implicits._
    texts.toDF("text")
      .select(fused.as("fused"), comp.as("comp"))
      .collect().forall(r => r.getSeq[String](0) == r.getSeq[String](1))
  }

  property("word_ngrams == split→concat_ws→distinct under adversarial unicode") =
    forAll(Gen.nonEmptyListOf(textGen), nGen) { (texts, n) =>
      allEqual(texts,
        graft.functions.WordNGrams(col("text"), lit(n)), composedWord(n))
    }

  property("char_ngrams == substr-transform→distinct under adversarial unicode") =
    forAll(Gen.nonEmptyListOf(textGen), nGen) { (texts, n) =>
      allEqual(texts,
        graft.functions.CharNGrams(col("text"), lit(n)), composedChar(n))
    }
}
