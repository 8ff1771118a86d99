package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{FuzzyJoin, Relevance}
import graft.ops.{Quality, Sessionize}

/** Round-10 operators beyond what their oracles pin: chunking covers
  * every token with the declared overlap, TF-IDF ranks are well-formed
  * and the df join is broadcast, winsorization clamps into the exact
  * percentile band, the funnel respects strict ordering on a hand-built
  * trace, and the blocked fuzzy join equals the brute-force witness
  * with no cartesian in the plan. */
class AnalyticsOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("doc_chunks: full token coverage, stride layout, tail bound") {
    val chunk = 32
    val stride = 24
    val got = ext.Corpus.docChunks(spark, sfDir, chunk, stride)
      .select("doc_id", "chunk_id", "start", "chunk_tokens", "chunk_text")
      .collect()
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    val byDoc = got.groupBy(_.getLong(0))
    assert(byDoc.keySet === toks.keySet) // every doc chunked
    byDoc.foreach { case (doc, rows) =>
      val n = toks(doc)
      val sorted = rows.sortBy(_.getLong(1))
      // starts are exactly 0, stride, 2*stride, ... < n
      assert(sorted.map(_.getLong(2)).toSeq ===
        (0L until n.toLong by stride.toLong).toSeq)
      sorted.foreach { r =>
        val start = r.getLong(2)
        val len = r.getLong(3)
        assert(len === math.min(chunk.toLong, n - start))
        // chunk_text really holds `len` tokens
        val nToks = if (r.getString(4).isEmpty) 0
                    else r.getString(4).split(" ", -1).length
        assert(nToks.toLong === len)
      }
      // consecutive chunks overlap by chunk - stride (except the tail)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) - a.getLong(2) === stride.toLong)
        case _ => ()
      }
    }
  }

  test("tfidf: ranks 1..k per doc, df consistent, broadcast df join") {
    val df = Relevance.tfidfTopTerms(spark, sfDir, 3)
    val rows = df.collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length).toSeq)
      assert(rs.length <= 3)
    }
    // doc_freq is a function of the term alone
    val dfByTerm = rows.groupBy(_.getString(2))
      .view.mapValues(_.map(_.getLong(4)).toSet)
    assert(dfByTerm.values.forall(_.size === 1))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"df join should broadcast the vocabulary side:\n$plan")
  }

  test("winsorize: bounds are data values, counts and clamp band hold") {
    val got = Quality.winsorizeStats(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect().groupBy(_._1)
    got.foreach { r =>
      val (et, lo, hi) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val vals = ev(et).map(_._2).sorted
      assert(lo <= hi)
      assert(vals.contains(lo) && vals.contains(hi)) // disc = real values
      assert(r.getLong(3) === vals.count(_ < lo))
      assert(r.getLong(4) === vals.count(_ > hi))
      // clipped mean sits inside the band
      val mean = r.getDouble(5) / vals.length
      assert(mean >= lo && mean <= hi)
      // at most 5% strictly outside each bound (percentile contract)
      assert(r.getLong(3) <= math.ceil(vals.length * 0.05).toLong)
      assert(r.getLong(4) <= math.ceil(vals.length * 0.05).toLong)
    }
    assert(got.length === 5)
  }

  test("funnel: strict ordering on a hand-built trace; monotone steps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // u1 completes in order; u2 clicks BEFORE viewing (click must not
    // count); u3 views only; u4's purchase ties the click ts exactly
    // (strict > drops it)
    Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(1), "view"),
      (4L, ts(1), "view"), (4L, ts(2), "click"), (4L, ts(2), "purchase"))
      .toDF("user_id", "ts", "event_type")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val r = Sessionize.funnelSteps(spark, dir).collect().head
    assert(r.getLong(0) === 4L) // all four viewed
    assert(r.getLong(1) === 2L) // u1, u4 clicked after viewing
    assert(r.getLong(2) === 1L) // only u1 purchased after the click
    // monotonicity on the real table too
    val real = Sessionize.funnelSteps(spark, sfDir).collect().head
    assert(real.getLong(0) >= real.getLong(1))
    assert(real.getLong(1) >= real.getLong(2))
  }

  test("cohort retention: day-0 anchors each cohort, bounds hold") {
    val rows = Sessionize.cohortRetention(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    val byCohort = rows.groupBy(_._1)
    byCohort.values.foreach { rs =>
      val day0 = rs.find(_._2 == 0)
      assert(day0.isDefined) // every cohort has its defining day
      // no later offset can exceed the cohort's founding size
      rs.foreach { case (_, _, n) => assert(n <= day0.get._3) }
      assert(rs.forall(_._2 >= 0))
    }
    // cohort sizes at day 0 partition the user base exactly
    val totalUsers = Tables.events(spark, sfDir)
      .select(countDistinct(col("user_id"))).as[Long].head()
    assert(byCohort.values.map(_.find(_._2 == 0).get._3).sum === totalUsers)
  }

  test("fuzzy join: blocked result equals brute force; no cartesian") {
    val df = FuzzyJoin.fuzzyNamePairs(spark, sfDir)
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // brute-force witness over the distinct vocabulary
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, sfDir).select("p_name")
      .distinct().as[String].collect()
    val want = (for {
      a <- names; b <- names
      if a < b && lev(a, b) == 1
    } yield (a, b)).toSet
    assert(got === want)
    assert(want.nonEmpty) // the witness is not vacuous
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"deletion-neighborhood blocking must stay an equi-join:\n$plan")
  }
}
