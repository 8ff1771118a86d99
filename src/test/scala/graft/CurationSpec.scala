package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Curation

/** Curation-operator contracts on the sf0.001 tables: the two-stage
  * domain cap is lossless vs the single-window definition, keep-first
  * dedup keeps exactly the earliest capture per payload, and the PMI
  * ingredient counts match a collected recount. */
class CurationSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("domainCaps: per-source cap respected and equal to the single-window form") {
    val got = Curation.domainCaps(spark, dir, cap = 10)
    val perSource = got.groupBy("source").count().collect()
    assert(perSource.nonEmpty)
    assert(perSource.forall(_.getLong(1) <= 10))
    // single-window reference — the oracle's definition
    val ref = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rnk") <= 10)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("keepFirst: keeps exactly the min-(ts, event_id) row per digest") {
    val got = Curation.keepFirst(spark, dir)
    val events = graft.Tables.events(spark, dir)
      .withColumn("digest", md5(concat_ws("|", col("event_type"), col("props"))))
    // one keeper per distinct digest
    assert(got.count() === events.select("digest").distinct().count())
    // keeper is the earliest capture: no event with the same digest is
    // strictly (ts, event_id)-before a keeper
    val keepers = got.join(events.select(col("event_id"), col("digest")), "event_id")
    val earlier = keepers.as("k")
      .join(events.as("e"), col("e.digest") === col("k.digest"))
      .filter(col("e.ts") < col("k.ts") ||
              (col("e.ts") === col("k.ts") && col("e.event_id") < col("k.event_id")))
    assert(earlier.isEmpty)
    // n_dupes accounts for every source row
    assert(got.agg(sum("n_dupes")).head.getLong(0) === events.count())
  }

  test("termPmi: pair and unigram counts match a collected recount") {
    val got = Curation.termPmi(spark, dir, minPair = 5).collect()
    assert(got.nonEmpty)
    val toks = graft.Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("t"))
      .collect().map(_.getSeq[String](0)).filter(_.size >= 2)
    val uni = toks.flatten.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val pairs = toks.flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    for (r <- got) {
      val (w1, w2) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === pairs((w1, w2)), s"pair_n($w1,$w2)")
      assert(r.getLong(3) === uni(w1), s"n1($w1)")
      assert(r.getLong(4) === uni(w2), s"n2($w2)")
    }
    // threshold is honored and nothing above it is missing
    val expected = pairs.filter(_._2 >= 5)
    assert(got.length === expected.size)
  }

  test("termPmi leaves no cached frames behind (r12 ADVICE leak)") {
    // the vocabulary materialization must not register anything with the
    // CacheManager — a library caller has no handle to unpersist it, so
    // a persist here would live for the whole session
    spark.catalog.clearCache()
    Curation.termPmi(spark, dir, minPair = 5).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
           "termPmi left a frame registered in the CacheManager")
  }
}
