package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WordNGrams

/** The native WordNGrams expression must be a drop-in for the composed
  * split→transform(concat_ws)→array_distinct shingle chain it replaced
  * in [[graft.ext.Dedup.shingles]]: same grams (by the reconstruction
  * identity, consecutive/leading/trailing spaces included), same
  * first-occurrence order, same empty-set short-doc contract — the
  * MinHash family's and decontamination's oracle parity ride on it. */
class WordNGramsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  /** The composed form WordNGrams replaced (Dedup's former
    * shinglesFromToks over a materialized toks column). */
  private def composed = {
    val t = split(col("text"), " ")
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(1), size(t) - 2),
        i => concat_ws(" ",
          element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  private val texts = Seq(
    "the quick brown fox jumps",       // plain
    "a b a b a b a b",                 // duplicate grams collapse, order kept
    "one two",                         // < 3 tokens → EMPTY (null LSH bands)
    "",                                // empty text → one empty token → EMPTY
    "a  double  spaced  text",         // empty pieces: grams rebuild space runs
    " leading and trailing ",          // boundary empties
    "héllo wörld straße über café")    // multi-byte: space scan is byte-safe

  test("WordNGrams equals the composed shingle chain, order included") {
    val df = texts.toDF("text")
      .select(WordNGrams(col("text"), lit(3)).as("fused"), composed.as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), r.toString)
    }
  }

  test("corpus-wide equality at the gate SF") {
    val diff = Tables.documents(spark, sfDir)
      .select(WordNGrams(col("text"), lit(3)).as("fused"), composed.as("hof"))
      .filter(not(col("fused") === col("hof")))
      .count()
    assert(diff === 0)
  }

  test("ngram_diversity report ≡ a plain-Scala witness over the fixture") {
    val texts = Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0))
    val rows = ext.Text.ngramDiversity(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    rows.foreach { r =>
      val n = r.getLong(0).toInt
      // same window semantics as WordWindowMd5: split keeps empties,
      // a doc shorter than n words contributes nothing
      val grams = texts.flatMap { t =>
        val toks = t.split(" ", -1)
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      }
      assert(r.getLong(1) == grams.length, s"n=$n total drifted")
      assert(r.getLong(2) == grams.distinct.length, s"n=$n distinct drifted")
      assert(r.getDouble(3) ==
        grams.distinct.length.toDouble / grams.length)
    }
  }

  test("interpreted path matches codegen; null text and non-positive n → null") {
    val keys = Seq("spark.sql.codegen.wholeStage" -> "false",
                   "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val olds = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    val expected = texts.toDF("text")
      .select(WordNGrams(col("text"), lit(3))).collect().map(_.getSeq[String](0))
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val interp = texts.toDF("text")
        .select(WordNGrams(col("text"), lit(3))).collect().map(_.getSeq[String](0))
      assert(interp === expected)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    val r = spark.sql(
      "SELECT word_ngrams(cast(null as string), 3) a, word_ngrams('a b c', 0) b")
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
