package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.Dedup.minhashFidelity]] — the audit must cover EXACTLY
  * the verified pair set (same pairs, same exact Jaccard as the
  * dedup_minhash_lsh gate: an audit over a drifted pair set audits
  * nothing), its estimator must be the Broder matching-lanes/8 ratio
  * recomputed from the signature gate's own lanes, and the estimate
  * must actually track the exact value on the fixture (a dead
  * estimator — all-0 or all-8 lanes regardless of similarity — would
  * pass the bookkeeping checks but not the correlation one). */
class MinhashFidelitySpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private lazy val audit = ext.Dedup.minhashFidelity(spark, sfDir).collect()

  test("audit rows ≡ the verified pair set, pair for pair, jaccard for jaccard") {
    val verified = ext.Dedup.dedupMinhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(audit.nonEmpty, "fixture lost its verified near-dup pairs")
    assert(audit.length == verified.size)
    audit.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(verified.contains(key), s"audit invented pair $key")
      assert(r.getDouble(4) == verified(key),
        s"pair $key exact jaccard drifted from the lsh gate")
    }
  }

  test("estimator bookkeeping: lanes in [0,8], est = lanes/8, error column closes") {
    audit.foreach { r =>
      val lanes = r.getLong(2)
      assert(lanes >= 0 && lanes <= 8)
      assert(r.getDouble(3) == lanes.toDouble / 8.0)
      assert(r.getLong(5) ==
        math.floor(math.abs(r.getDouble(3) - r.getDouble(4)) * 1000000.0).toLong)
    }
  }

  test("the estimate tracks the exact value (live estimator, not a constant)") {
    // verified pairs all have J >= 0.5, so lanes should skew high...
    val meanEst = audit.map(_.getDouble(3)).sum / audit.length
    val meanJac = audit.map(_.getDouble(4)).sum / audit.length
    assert(meanEst > 0.25,
      s"mean estimate $meanEst implausibly low for J>=0.5 pairs")
    // ...and the mean absolute error must beat a DEAD estimator: a
    // constant-0 estimator's MAE would be meanJac itself
    val mae = audit.map(r => math.abs(r.getDouble(3) - r.getDouble(4))).sum /
      audit.length
    assert(mae < meanJac,
      s"estimator MAE $mae no better than predicting zero ($meanJac)")
  }
}
