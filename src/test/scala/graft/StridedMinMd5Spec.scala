package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StridedMinMd5

/** The native StridedMinMd5 expression must be a drop-in for the
  * exploded generator→md5(substr)→min-aggregate fingerprint chain it
  * replaced in [[graft.ext.Text.fingerprint]]: same minimum digest
  * (1-based code-point positions, end-clamped final window, whole-text
  * window for short docs), and the fused fingerprint plan must carry no
  * exchange at all. */
class StridedMinMd5Spec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  /** The exploded form the expression replaced. */
  private def composed(df: org.apache.spark.sql.DataFrame) = {
    val n = greatest(length(col("text")) - 7, lit(1))
    df.select(col("doc_id"), col("text"),
        explode(sequence(lit(1), n, lit(4))).as("i"))
      .groupBy(col("doc_id"))
      .agg(min(md5(col("text").substr(col("i"), lit(8)))).as("fp"))
  }

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog and runs on",  // plain
    "short",                                  // < 8 chars → whole-text window
    "",                                       // empty → md5("")
    "exactly8",                               // one full window
    "thirteen chars",                         // len 14 → two windows (starts 1, 5)
    "héllo wörld straße über café naïve über")// multi-byte: positions are chars

  test("StridedMinMd5 equals the exploded min-aggregate chain") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fused = df.select(col("doc_id"),
      StridedMinMd5(col("text"), lit(8), lit(4)).as("fused_fp"))
    val joined = fused.join(composed(df), Seq("doc_id"), "full")
    assert(joined.count() === texts.size.toLong)
    assert(joined.filter(col("fused_fp").isNull || col("fp").isNull ||
                         col("fused_fp") =!= col("fp")).count() === 0)
  }

  test("corpus-wide equality at the gate SF") {
    val docs = Tables.documents(spark, sfDir)
    val fused = docs.select(col("doc_id"),
      StridedMinMd5(col("text"), lit(8), lit(4)).as("fused_fp"))
    val diff = fused.join(composed(docs), "doc_id")
      .filter(col("fused_fp") =!= col("fp")).count()
    assert(diff === 0)
  }

  test("fingerprint plan is a pure projection — zero exchanges, zero aggregates") {
    val plan = ext.Text.fingerprint(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the presentation orderBy adds a range exchange at the very top;
    // the fingerprint itself must add none: no hash exchange, no
    // generator, no aggregate
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Generate"), plan)
    assert(!plan.contains("HashAggregate"), plan)
  }

  test("interpreted path matches codegen; null text and non-positive args → null") {
    val keys = Seq("spark.sql.codegen.wholeStage" -> "false",
                   "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val olds = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    val expected = texts.toDF("text")
      .select(StridedMinMd5(col("text"), lit(8), lit(4))).collect()
      .map(_.getString(0))
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val interp = texts.toDF("text")
        .select(StridedMinMd5(col("text"), lit(8), lit(4))).collect()
        .map(_.getString(0))
      assert(interp === expected)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    val r = spark.sql(
      "SELECT strided_min_md5(cast(null as string), 8, 4) a, " +
      "strided_min_md5('abc', 0, 4) b, strided_min_md5('abc', 8, 0) c")
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
