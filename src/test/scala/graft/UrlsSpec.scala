package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.Urls]]' canonicalization and list semantics on
  * hand-computed witnesses — the per-URL corners the aggregate DuckDB
  * gates can't isolate. */
class UrlsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def curateOf(ids: Long*): Map[Long, (String, String, Boolean)] =
    CacheScope.scoped(spark) {
      ext.Urls.urlCurate(spark, sfDir)
        .filter(col("doc_id").isin(ids: _*)).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
          r.getBoolean(5))).toMap
    }

  test("canonicalization: scheme case, WWW., port and path all strip") {
    // doc 0: HTTP:// (0%5=0), WWW. (0%7=0), cdn. (0%3=0), src0,
    // .com (0 div 20 = 0), :8080 (0%11=0) — everything to normalize
    // at once
    val m = curateOf(0L, 1L, 35L)
    assert(m(0L)._1 == "cdn.src0.com")
    assert(m(0L)._2 == "src0.com")
    // doc 1: https, no www, no cdn, src1, .com, no port
    assert(m(1L)._1 == "src1.com")
    assert(m(1L)._2 == "src1.com" && !m(1L)._3) // src1 blocked
    // doc 35: 35%5=0 HTTP://, 35%7=0 WWW., 35%3!=0 no cdn, src15,
    // 35 div 20 = 1 → .org
    assert(m(35L)._1 == "src15.org" && m(35L)._3)
  }

  test("registrable domain: co.uk takes three labels, others two") {
    // find a planted co.uk doc with a cdn subdomain: need
    // (id div 20) % 4 = 3 and id % 3 = 0 → id = 60 (60 div 20 = 3)
    val m = curateOf(60L)
    assert(m(60L)._1 == "cdn.src0.co.uk")
    assert(m(60L)._2 == "src0.co.uk")
  }

  test("allowlist overrides blocklist, and both branches are live") {
    val rows = CacheScope.scoped(spark) {
      ext.Urls.urlCurate(spark, sfDir).collect()
        .map(r => (r.getString(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5)))
    }
    // some blocked-and-dropped, some allowlisted-back, plenty untouched
    assert(rows.exists(r => r._2 && !r._3 && !r._4), "no blocked docs")
    assert(rows.exists(r => r._2 && r._3 && r._4),
      "allowlist override never fired — planted lists went vacuous")
    assert(rows.count(_._4) > rows.length / 2, "most docs should keep")
    // the override is exactly src13.co.uk
    for ((d, b, a, k) <- rows if a) assert(d == "src13.co.uk" && b && k)
    // kept == allow || !block, row for row
    for ((_, b, a, k) <- rows) assert(k == (a || !b))
  }

  test("plan: per-row verdicts — no join, no exchange on the doc side") {
    // r21: the in-plan block/allow lists were tautological (built from
    // the probed corpus' own domains, then joined back on domain) and
    // are now per-row predicates — the manifest must plan as ONE scan
    // with zero joins and zero exchanges before the presentation sort.
    // An EXTERNAL list artifact would legitimately reintroduce a
    // broadcast join; this pin guards the self-contained gate's shape.
    CacheScope.scoped(spark) {
      val plan = ext.Urls.urlCurate(spark, sfDir)
        .queryExecution.sparkPlan.toString
      assert(!plan.contains("Join"), plan.take(500))
      // the only exchange is the presentation sort's SinglePartition
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= 1, s"unexpected exchanges:\n${plan.take(800)}")
    }
  }

  test("host stats partition the per-doc manifest") {
    CacheScope.scoped(spark) {
      val stats = ext.Urls.urlHostStats(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      val perDoc = ext.Urls.urlCurate(spark, sfDir).collect()
        .map(r => (r.getString(2), r.getBoolean(5)))
      assert(stats.map(_._2).sum == perDoc.length)
      assert(stats.map(_._4).sum == perDoc.count(_._2))
      for ((d, n, nb, nk) <- stats) {
        assert(n == nb + nk, s"$d: blocked+kept != docs")
        assert(perDoc.count(_._1 == d) == n)
      }
    }
  }
}
