package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.Funnel.incrementalFunnel]]'s contract beyond the DuckDB
  * gate: the per-increment funnel is monotone and starts at the batch
  * totals, its exact-dedup stage is the batch-keeper ∧ not-in-history
  * set, and the plan keeps the frozen-history discipline — the X84
  * bloom probe guards the band join, the history digest set is probed
  * by a broadcast batch list (history never re-shuffles per batch),
  * and nothing cartesian-explodes. */
class IncrementalFunnelSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def run[T](body: => T): T = CacheScope.scoped(spark)(body)

  test("stages are monotone and stage 1 is the batch totals") {
    run {
      val rows = ext.Funnel.incrementalFunnel(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      assert(rows.map(_._1).toSeq == (1L to 8L))
      val batch = Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 5 === 0)
        .select(count(lit(1)),
                sum(size(split(col("text"), " ")).cast("long")))
        .head()
      assert(rows.head._3 == batch.getLong(0), "stage 1 docs ≠ batch size")
      assert(rows.head._4 == batch.getLong(1), "stage 1 tokens ≠ batch tokens")
      rows.sliding(2).foreach { case Array(a, b) =>
        assert(b._3 <= a._3 && b._4 <= a._4,
               s"funnel not monotone: ${a._2} -> ${b._2}")
      }
      // the url stage and the planted cross-split near-dups must each
      // actually drop something (stage 2 = url_filter, 3 = exact, 4 = near)
      assert(rows(1)._3 < rows(0)._3, "url stage dropped nothing")
      val (s3, s4) = (rows(2)._3, rows(3)._3)
      assert(s4 < s3, "near-dedup stage dropped nothing — fixture broken?")
    }
  }

  test("exact-dedup stage = batch digest keeper ∧ digest not in history") {
    run {
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), md5(col("text")).as("digest"))
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val histDigests = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("digest")).distinct().collect().map(_.getString(0)).toSet
      val keepers = batch.groupBy(col("digest"))
        .agg(min(col("doc_id")).as("k")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // the cumulative stage-3 flag also carries stage 2 (url_filter)
      val urlKept = ext.Urls.urlCurate(spark, sfDir).filter(col("kept"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val expected = batch.collect().count { r =>
        val (id, dg) = (r.getLong(0), r.getString(1))
        urlKept(id) && keepers(dg) == id && !histDigests(dg)
      }
      val s3 = ext.Funnel.incrementalFunnel(spark, sfDir)
        .filter(col("stage") === 3).head().getLong(2)
      assert(s3 == expected, s"stage 3: $s3 != $expected")
    }
  }

  test("per-language increment funnel partitions the global increment " +
       "funnel exactly") {
    // same frozen-history flag frame, two aggregation scopes: summing
    // each stage over languages must reproduce the global increment
    // report to the row (the FunnelSpec pin applied to the increment)
    val global = run {
      ext.Funnel.incrementalFunnel(spark, sfDir).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    }
    val byLang = run {
      ext.Funnel.incrementalFunnelByLang(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    }
    assert(byLang.map(_._1).distinct.length > 1, "fixture lost its languages")
    (1L to 8L).foreach { stage =>
      val rows = byLang.filter(_._2 == stage)
      assert((rows.map(_._3).sum, rows.map(_._4).sum) == global(stage),
             s"stage $stage does not partition")
    }
    // and each language's own increment funnel is monotone
    byLang.groupBy(_._1).foreach { case (lang, rows) =>
      rows.sortBy(_._2).map(_._3).sliding(2).foreach { case Array(a, b) =>
        assert(b <= a, s"$lang increment funnel not monotone")
      }
    }
  }

  test("plan: bloom probe present, history digest set probed by a " +
       "broadcast batch list, no cartesian") {
    run {
      val plan = ext.Funnel.incrementalFunnel(spark, sfDir)
        .queryExecution.sparkPlan.toString
      // X84's bloom pre-filter survives the composition
      assert(plan.contains("might_contain"), plan.take(800))
      // the history-digest restriction is a broadcast join (the batch
      // digest list is the build side — history rows are only probed,
      // never shuffled for the batch)
      assert(plan.contains("BroadcastHashJoin"), plan.take(800))
      // no true cartesian anywhere; BroadcastNestedLoopJoin appears
      // only as the justified 1-row broadcast crosses (LM vocab count,
      // tertile bounds) every scoring plan carries
      assert(!plan.contains("CartesianProduct"),
             "funnel plan cartesian-exploded")
    }
  }
}
