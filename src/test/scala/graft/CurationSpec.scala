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

  test("substrDupSpans: matches a collected brute-force recount (span-merge identity)") {
    val w = 8
    val got = Curation.substrDupSpans(spark, dir, w = w).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    graft.CacheScope.release(spark)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val grams = docs.flatMap { case (id, t) =>
      t.sliding(w).zipWithIndex.collect {
        case (g, i) if g.size == w => (id, i, g.mkString(" ")) } }
    // duplicated = the gram text occurs in >= 2 distinct documents
    val dupSet = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val byDoc = grams.filter(g => dupSet(g._3)).groupBy(_._1)
    assert(byDoc.nonEmpty && got.keySet === byDoc.keySet)
    val tokCount = docs.toMap
    for ((id, ms) <- byDoc) {
      val starts = ms.map(_._2).sorted
      // interval-union sweep over equal-width windows — the reference
      // form of the identity the operator computes with array HOFs
      var covered = w.toLong; var spans = 1L
      starts.sliding(2).foreach {
        case Array(a, b) => covered += math.min(w, b - a); if (b - a > w) spans += 1
        case _ => ()
      }
      val n = tokCount(id).size
      val (nTokens, dupWindows, nSpans, dupTokens, ppm) = got(id)
      assert(nTokens === n.toLong, s"n_tokens($id)")
      assert(dupWindows === starts.size.toLong, s"dup_windows($id)")
      assert(nSpans === spans, s"n_spans($id)")
      assert(dupTokens === covered, s"dup_tokens($id)")
      assert(ppm === math.floor(covered * 1000000.0 / n).toLong, s"dup_ppm($id)")
    }
  }

  test("substrDedupApply: removal is the report's dup_tokens to the row, " +
       "and the cleaned text is exactly the uncovered subsequence") {
    val w = 8
    val applied = Curation.substrDedupApply(spark, dir, w = w).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    graft.CacheScope.release(spark)
    val report = Curation.substrDupSpans(spark, dir, w = w).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap // dup_tokens
    graft.CacheScope.release(spark)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    // the apply and the report must agree on how much was cut: the
    // removed count IS the interval-union size the report computes
    docs.foreach { case (id, toks) =>
      val (n, kept, removed, _) = applied(id)
      assert(n == toks.size.toLong, s"n_tokens($id)")
      assert(kept + removed == n, s"accounting($id)")
      assert(removed == report.getOrElse(id, 0L),
             s"removed($id) != report dup_tokens")
    }
    // and the cleaned text is the original with covered positions cut —
    // an order-preserving subsequence, recomputed brute-force
    val grams = docs.flatMap { case (id, t) =>
      t.sliding(w).zipWithIndex.collect {
        case (g, i) if g.size == w => (id, i, g.mkString(" ")) } }
    val dupSet = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val coveredByDoc = grams.filter(g => dupSet(g._3))
      .groupBy(_._1).view.mapValues(_.flatMap(m => m._2 until m._2 + w).toSet)
    docs.foreach { case (id, toks) =>
      val covered = coveredByDoc.getOrElse(id, Set.empty[Int])
      val expect = toks.zipWithIndex.collect {
        case (tok, i) if !covered(i) => tok }.mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(expect.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(applied(id)._4 == hex, s"clean text diverged for $id")
    }
  }

  test("substrDupSpans: two-agg distinct-doc count, no Window, no Expand, one join") {
    // the boilerplate gram is the skewed key at crawl scale: distinct-doc
    // counting must stay groupBy(digest, doc).groupBy(digest) — partial
    // agg collapses the hot digest map-side BOTH times; count(DISTINCT)
    // would plan an Expand, a lag-window span merge would plan a Window,
    // and either funnels the hot key through one task
    val plan = Curation.substrDupSpans(spark, dir)
      .queryExecution.executedPlan.toString
    graft.CacheScope.release(spark)
    assert(!plan.contains("Window"), s"span merge reintroduced a window:\n$plan")
    assert(!plan.contains("Expand"), s"count-distinct Expand planned:\n$plan")
    assert("Join".r.findAllIn(plan).size === 1,
           s"expected exactly the digest mark-back join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan)
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
