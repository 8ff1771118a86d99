package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.SemDedup.dedupSemantic]]'s policy invariants — the
  * properties the value-comparing gate can't see (the gate verifies ONE
  * (blockW, tau) point; these hold for the family). */
class SemDedupSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def run(blockW: Int = 32, tau: Double = 0.3) =
    CacheScope.scoped(spark) {
      ext.SemDedup.dedupSemantic(spark, sfDir, blockW, tau).collect().toSeq
    }

  private lazy val base = run()

  test("one output row per corpus vector, schema as contracted") {
    val n = Tables.embeddings(spark, sfDir).count()
    assert(base.size == n)
    assert(base.head.schema.fieldNames.toSeq ==
      Seq("vec_id", "label", "centroid_sim", "is_dup"))
  }

  test("every cell keeps its lowest-priority member (a chain never drops whole)") {
    // the cell's (csim, vec_id)-minimum has no lower-priority candidate,
    // so NO tau/blockW setting may ever flag it
    val minByCell = base.groupBy(_.getInt(1)).values.map(
      _.minBy(r => (r.getDouble(2), r.getLong(0))))
    assert(minByCell.nonEmpty)
    minByCell.foreach(r => assert(r.getInt(3) == 0,
      s"cell-minimum ${r.getLong(0)} flagged as dup"))
  }

  test("raising tau monotonically shrinks the drop set") {
    val dropsAt = (t: Double) =>
      run(tau = t).filter(_.getInt(3) == 1).map(_.getLong(0)).toSet
    val (lo, mid, hi) = (dropsAt(0.2), dropsAt(0.3), dropsAt(0.5))
    assert(lo.size >= mid.size && mid.size >= hi.size)
    assert(mid.subsetOf(lo) && hi.subsetOf(mid))
    assert(lo.nonEmpty, "tau=0.2 flags nothing at this SF — spec is vacuous")
  }

  test("widening the block monotonically grows the drop set (recall dial)") {
    // any pair co-blocked at W is ≤ 2W−1 ranks apart, hence co-blocked at
    // 2W too — the W=64 candidate set is a strict superset of W=32's
    val (w32, w64) = (base.filter(_.getInt(3) == 1).map(_.getLong(0)).toSet,
                      run(blockW = 64).filter(_.getInt(3) == 1).map(_.getLong(0)).toSet)
    assert(w32.subsetOf(w64))
  }

  test("plan: centroid codebook joins broadcast; pair join is equi, not cartesian") {
    // scoped: dedupSemantic pins its blocked frame at plan-construction
    // time, and a plan-only test must not leak that pin into the shared
    // session for later suites
    CacheScope.scoped(spark) {
      val plan = ext.SemDedup.dedupSemantic(spark, sfDir)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastExchange"), plan)
      assert(!plan.contains("CartesianProduct") &&
             !plan.contains("BroadcastNestedLoopJoin"), plan)
    }
    assert(CacheScope.livePinned(spark) == 0)
  }

  test("pinned frames are released by the scope (no cache leak)") {
    CacheScope.scoped(spark) {
      ext.SemDedup.dedupSemantic(spark, sfDir).count()
      assert(CacheScope.livePinned(spark) > 0)
    }
    assert(CacheScope.livePinned(spark) == 0)
  }
}
