package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CharNGrams

/** The native CharNGrams expression must be a drop-in for the composed
  * split("")→transform+concat→array_distinct chain it replaced in
  * [[graft.ext.Dedup.dedupNgramJaccard]]: same grams, same
  * first-occurrence order, same short-text fallback, in BOTH the codegen
  * and interpreted paths — the `dedup_ngram_jaccard` oracle parity rides
  * on it. */
class CharNGramsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** The composed form CharNGrams replaced (Dedup's former
    * charGramsFromChars, inlined over split(text, "")). */
  private def composed = {
    val ch = split(col("text"), "")
    when(size(ch) >= 3,
      array_distinct(transform(sequence(lit(1), size(ch) - 2),
        i => concat(element_at(ch, i), element_at(ch, i + 1),
                    element_at(ch, i + 2)))))
      .otherwise(array(concat_ws("", ch)))
  }

  private val texts = Seq(
    "the quick brown fox",  // plain
    "aaaaaa",               // heavy duplicate grams → distinct collapses
    "ab",                   // < n chars → [text]
    "abc",                  // exactly n → one gram
    "",                     // empty → [""]
    "héllo wörld café")     // BMP multi-byte: code points == split("") chars

  test("CharNGrams equals the composed HOF chain, order included") {
    val df = texts.toDF("text")
      .select(CharNGrams(col("text"), lit(3)).as("fused"), composed.as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), r.toString)
    }
  }

  test("interpreted path matches codegen path") {
    val keys = Seq("spark.sql.codegen.wholeStage" -> "false",
                   "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val olds = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    val expected = texts.map(t =>
      Seq(t).toDF("text").select(CharNGrams(col("text"), lit(3))).collect()(0).getSeq[String](0))
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val interp = texts.map(t =>
        Seq(t).toDF("text").select(CharNGrams(col("text"), lit(3))).collect()(0).getSeq[String](0))
      assert(interp === expected)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("null text → null; non-positive n → null; substr-style code points on astral chars") {
    val r = spark.sql("SELECT char_ngrams(cast(null as string), 3) a, char_ngrams('abcdef', 0) b")
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    // an astral-plane char (surrogate pair in UTF-16) is ONE position,
    // matching substring(text, i, 3) in Spark SQL and DuckDB — unlike
    // split(text, ''), which would halve the pair (documented deviation)
    val astral = spark.sql("SELECT char_ngrams('a😀b', 3) g").collect()(0).getSeq[String](0)
    assert(astral === Seq("a😀b"))
    val sub = spark.sql("SELECT substring('a😀bc', 2, 3) s").collect()(0).getString(0)
    assert(sub === "😀bc") // substr counts the emoji as one char, same as CharNGrams
  }
}
