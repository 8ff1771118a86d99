package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WordWindowMd5

/** The native WordWindowMd5 expression must be a drop-in for the
  * composed split→transform(md5(concat_ws(slice)))) window-digest chain
  * [[graft.ext.Curation.substrDupSpans]] originally shipped with: same
  * digests at the same POSITIONS (the span merge keys on index), same
  * empty-array short-doc contract — the ExactSubstr gate's DuckDB md5
  * parity rides on it. */
class WordWindowMd5Spec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  /** The composed form the expression replaced (Curation's original
    * window-digest build). */
  private def composed(w: Int) = {
    val t = split(col("text"), " ")
    when(size(t) >= w,
      transform(sequence(lit(0), size(t) - w),
        i => md5(concat_ws(" ", slice(t, i + 1, lit(w))))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",  // plain
    "a b a b a b a b",                              // repeated windows keep POSITION
    "one two three",                                // < w tokens → EMPTY
    "",                                             // empty text → one empty token → EMPTY
    "a  double  spaced  text here now go on",       // empty pieces rebuild space runs
    " leading and trailing tokens in this text ",   // boundary empties
    "héllo wörld straße über café naïve re über x") // multi-byte: byte-safe scan

  test("WordWindowMd5 equals the composed digest chain, positions included") {
    val df = texts.toDF("text")
      .select(WordWindowMd5(col("text"), lit(4)).as("fused"),
              composed(4).as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), r.toString)
    }
  }

  test("corpus-wide equality at the gate SF and the gate width") {
    val diff = Tables.documents(spark, sfDir)
      .select(WordWindowMd5(col("text"), lit(8)).as("fused"),
              composed(8).as("hof"))
      .filter(not(col("fused") === col("hof")))
      .count()
    assert(diff === 0)
  }

  test("digest parity with Spark's own md5 on a whole-text window") {
    // w == token count → exactly one window covering the full text:
    // its digest must be md5(text) itself (reconstruction identity)
    val r = Seq("five tokens exactly in here").toDF("text")
      .select(WordWindowMd5(col("text"), lit(5)).as("a"),
              md5(col("text")).as("b")).collect()(0)
    assert(r.getSeq[String](0) === Seq(r.getString(1)))
  }

  test("interpreted path matches codegen; null text and non-positive w → null") {
    val keys = Seq("spark.sql.codegen.wholeStage" -> "false",
                   "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val olds = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    val expected = texts.toDF("text")
      .select(WordWindowMd5(col("text"), lit(4))).collect().map(_.getSeq[String](0))
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val interp = texts.toDF("text")
        .select(WordWindowMd5(col("text"), lit(4))).collect().map(_.getSeq[String](0))
      assert(interp === expected)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    val r = spark.sql(
      "SELECT word_window_md5(cast(null as string), 4) a, " +
      "word_window_md5('a b c', 0) b").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
