package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.Funnel.corpusFunnel]]'s consistency with the per-stage
  * operators it composes — the properties the DuckDB gate can't see
  * (the gate proves the numbers; these prove the numbers MEAN what the
  * stage operators report individually). */
class FunnelSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("funnel is monotone and cross-consistent with the stage operators") {
    CacheScope.scoped(spark) {
      val rows = ext.Funnel.corpusFunnel(spark, sfDir).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
      assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
      (1L to 7L).foreach { s =>
        assert(rows(s)._1 >= rows(s + 1)._1 && rows(s)._2 >= rows(s + 1)._2,
          s"stage $s -> ${s + 1} grew: $rows")
      }
      // stage 1 = the corpus; stage 2 = url_curate's kept count
      val docs = Tables.documents(spark, sfDir)
      assert(rows(1L)._1 == docs.count())
      val urlKept = ext.Urls.urlCurate(spark, sfDir).filter(col("kept"))
        .select(col("doc_id"))
      assert(rows(2L)._1 == urlKept.count())
      // stage 2 must genuinely filter, or the planted lists went vacuous
      assert(rows(2L)._1 < rows(1L)._1, "url_filter dropped nothing")
      // stage 4 = dedup_clusters' keepers AMONG url survivors
      val keepers = ext.Cluster.dedupClusters(spark, sfDir)
        .filter(col("doc_id") === col("cluster_rep"))
        .join(urlKept, "doc_id").count()
      // exact dedup drops nothing on this fixture (no identical texts),
      // so the cumulative stage-3 count equals stage 2
      assert(rows(3L)._1 == rows(2L)._1)
      assert(rows(4L)._1 == keepers, s"${rows(4L)._1} vs $keepers")
      // tokens of stage 1 = corpus token count
      val toks = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
      assert(rows(1L)._2 == toks)
    }
    assert(CacheScope.livePinned(spark) == 0)
  }

  test("stage aggregates ride one scan: a single stack Generate, no cartesian") {
    CacheScope.scoped(spark) {
      val plan = ext.Funnel.corpusFunnel(spark, sfDir)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("Generate stack"), plan.take(400))
      assert(!plan.contains("CartesianProduct"), plan.take(400))
    }
  }

  test("per-language funnel partitions the global funnel exactly") {
    // same flag frame, two aggregation scopes: summing each stage over
    // languages must reproduce the global report to the row
    val global = CacheScope.scoped(spark) {
      ext.Funnel.corpusFunnel(spark, sfDir).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    }
    val byLang = CacheScope.scoped(spark) {
      ext.Funnel.corpusFunnelByLang(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    }
    assert(byLang.map(_._1).distinct.length > 1, "fixture lost its languages")
    (1L to 8L).foreach { stage =>
      val rows = byLang.filter(_._2 == stage)
      assert((rows.map(_._3).sum, rows.map(_._4).sum) == global(stage),
             s"stage $stage does not partition")
    }
    // and each language's own funnel is monotone
    byLang.groupBy(_._1).foreach { case (lang, rows) =>
      rows.sortBy(_._2).map(_._3).sliding(2).foreach { case Array(a, b) =>
        assert(b <= a, s"$lang funnel not monotone")
      }
    }
  }
}
