package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the CacheScope lifecycle contract the harnesses depend on:
  * per-session ledger accounting through pin/release, and — the r15
  * ADVICE fix — that the context-cleanup SparkListener installs ONCE per
  * SparkContext, not once per pin/release cycle. Bench/Verify release
  * between every query; a presence-keyed guard re-registered a listener
  * each cycle, growing the shared listener bus without bound. */
class CacheScopeSpec extends AnyFunSuite {
  import TestSpark.spark

  test("repeated pin/release cycles install at most one context listener") {
    import spark.implicits._
    CacheScope.release(spark) // start from a clean ledger
    val before = CacheScope.listenerInstalls
    for (i <- 1 to 5) {
      val p = CacheScope.pin(Seq(i, i + 1).toDF("x"))
      assert(p.count() === 2) // the pinned frame is the caller's frame
      assert(CacheScope.livePinned(spark) === 1)
      assert(CacheScope.release(spark) === 1)
      assert(CacheScope.livePinned(spark) === 0)
    }
    // ≤ 1, not == 1: an earlier suite may already have installed for
    // this shared context — the bug being pinned is GROWTH per cycle.
    assert(CacheScope.listenerInstalls - before <= 1,
      s"${CacheScope.listenerInstalls - before} listener installs in 5 pin/release cycles")
  }

  test("scoped releases pins when the body THROWS — the however-it-exits contract") {
    import spark.implicits._
    CacheScope.release(spark)
    val boom = intercept[RuntimeException] {
      CacheScope.scoped(spark) {
        CacheScope.pin(Seq(1, 2).toDF("x"))
        assert(CacheScope.livePinned(spark) === 1)
        throw new RuntimeException("query failed mid-scope")
      }
    }
    assert(boom.getMessage === "query failed mid-scope")
    assert(CacheScope.livePinned(spark) === 0,
      "a throwing scope must still release its pins")
  }

  test("a second session of the same context shares the one listener but not the ledger") {
    val s2 = spark.newSession()
    import s2.implicits._
    val before = CacheScope.listenerInstalls
    CacheScope.pin(Seq(1).toDF("x"))
    assert(CacheScope.livePinned(s2) === 1)
    assert(CacheScope.livePinned(spark) === 0,
      "ledger keys must be per-session, not per-context")
    assert(CacheScope.release(s2) === 1)
    assert(CacheScope.listenerInstalls === before,
      "same context must not install a second listener")
  }
}
