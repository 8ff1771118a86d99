package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.KMeans]]'s Lloyd semantics on hand-built geometry — the
  * definitional properties behind the unrolled DuckDB gate. */
class KMeansSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def train(vs: Seq[(Long, Seq[Double])], k: Int, rounds: Int) =
    CacheScope.scoped(spark) {
      ext.KMeans.kmeansFrame(
        vs.toDF("vec_id", "v"), k, rounds)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }

  test("two well-separated clusters converge to their exact means") {
    // seeds 0 and 1 start INSIDE cluster A; round 1 must pull seed 1's
    // cell over to cluster B (all B points are nearer it), and by
    // round 2 the update sums are the per-cluster exact means
    val a = Seq(0L -> Seq(0.0, 0.0), 1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0))
    val b = Seq(3L -> Seq(10.0, 10.0), 4L -> Seq(11.0, 10.0), 5L -> Seq(10.0, 11.0))
    val out = train(a ++ b, k = 2, rounds = 3)
    val byCell = out.groupBy(_._1)
    // every point accounted for, each cluster in one cell
    assert(byCell(0L).map(_._4).toSet == Set(3L))
    assert(byCell(1L).map(_._4).toSet == Set(3L))
    // cell 0 holds cluster A: qsum over dim0 = (0+1+0)·1e6
    val q0 = byCell(0L).map(t => t._2 -> t._3).toMap
    assert(q0(0L) == 1000000L && q0(1L) == 1000000L, q0.toString)
    val q1 = byCell(1L).map(t => t._2 -> t._3).toMap
    assert(q1(0L) == 31000000L && q1(1L) == 31000000L, q1.toString)
  }

  test("an emptied cell keeps its seed and can recapture points next round") {
    // both seeds sit at the same point: round 1 ties everything into
    // cell 0 (cell 1 empty, absent from the update — no crash, no NaN
    // centroid), and the PRESERVED seed then recaptures the points at
    // the origin in round 2 once cell 0's centroid has drifted to the
    // cluster mean — the behavior the keep-seed rule exists for
    val vs = Seq(0L -> Seq(0.0), 1L -> Seq(0.0), 2L -> Seq(0.1))
    val r1 = train(vs, k = 2, rounds = 1)
    assert(r1.map(_._1).toSet == Set(0L) && r1.map(_._4).sum == 3L)
    val r2 = train(vs, k = 2, rounds = 2)
    val byCell = r2.groupBy(_._1).view.mapValues(_.map(_._4).head).toMap
    assert(byCell == Map(0L -> 1L, 1L -> 2L), r2.mkString(","))
  }

  test("assignment ties break on cell id identically to the oracle's ORDER BY") {
    // equidistant point: score ties exactly; the min-struct must pick
    // the smaller cell, matching row_number ORDER BY score, cell
    val vs = Seq(0L -> Seq(-1.0), 1L -> Seq(1.0), 2L -> Seq(0.0))
    val out = train(vs, k = 2, rounds = 1)
    val cell0n = out.filter(_._1 == 0L).map(_._4).head
    assert(cell0n == 2L, s"tie vector must land in cell 0: $out")
  }
}
