package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's stall heuristic ([[Bench.suspectOf]]) — the rule that
  * decides which minima cross-round judging may trust, which queries
  * get rescue repeats, and which land in BENCH_LAST.json's
  * `stall_suspect` list. Reps are (elapsed sec, steal fraction) pairs.
  * No SparkSession involved — pure decision logic. */
class BenchHeuristicsSpec extends AnyFunSuite {

  test("empty window is not suspect (no timed result is reported separately)") {
    assert(!Bench.suspectOf(Nil))
  }

  test("converged reps with clean steal are trusted") {
    assert(!Bench.suspectOf(Seq((1.20, 0.0), (1.25, 0.01), (1.22, 0.0))))
  }

  test("a min rep measured under steal is suspect even when reps converge") {
    // r15's failure mode: a burst outlasting every rep poisons the min
    // itself; the spread alone cannot see it.
    assert(Bench.suspectOf(Seq((6.68, 0.30), (6.70, 0.28), (6.75, 0.31))))
  }

  test("steal on a NON-min rep does not condemn a clean min") {
    // the min rep ran clean — the stall hit another repeat and the min
    // estimator already filtered it
    assert(!Bench.suspectOf(Seq((1.20, 0.0), (3.30, 0.40), (1.22, 0.01))))
  }

  test("wildly disagreeing reps are suspect even with zero measured steal") {
    // sub-steal host contention: /proc/stat reads clean while the box
    // runs a repeat seconds slower (observed r16: spread 8.2 s on a
    // 0.9 s min at 0% steal)
    assert(Bench.suspectOf(Seq((0.91, 0.0), (9.11, 0.0))))
  }

  test("the absolute floor keeps sub-second jitter out of the suspect list") {
    // max−min of 0.9 s on a 0.1 s min is > 2×min but under the 1 s
    // floor: scheduling jitter on a tiny query, not a stall
    assert(!Bench.suspectOf(Seq((0.10, 0.0), (1.00, 0.0))))
    // ...and just past the floor it IS a stall signal
    assert(Bench.suspectOf(Seq((0.10, 0.0), (1.21, 0.0))))
  }

  test("steal exactly at the threshold is not suspect; above it is") {
    assert(!Bench.suspectOf(Seq((2.0, Bench.StealThreshold))))
    assert(Bench.suspectOf(Seq((2.0, Bench.StealThreshold + 0.001))))
  }

  // ---- publish: the published window and its flag always agree ------
  // (r16 ADVICE: a merged min with a retry-only flag could put
  // steal_frac > threshold on a row NOT in stall_suspect. Rule: publish
  // the steal-clean reps of both windows, flag = suspectOf(published);
  // all-stolen falls back to merged, whose stolen min flags it.)

  private val stalled = Seq((6.7, 0.30), (6.8, 0.28), (6.7, 0.31))
  private val clean = Seq((1.20, 0.0), (1.25, 0.01), (1.22, 0.0))

  test("publish: a clean window passes through unflagged") {
    assert(Bench.publish(clean, Nil) == ((clean, false)))
  }

  test("publish: all-stolen with no retry falls back to merged, flagged") {
    assert(Bench.publish(stalled, Nil) == ((stalled, true)))
  }

  test("publish: a clean retry REPLACES a fully stalled first window") {
    // the stalled reps (including their steal-tainted min) must not
    // leak into the published stats of a non-suspect row
    val (pub, suspect) = Bench.publish(stalled, clean)
    assert(pub == clean && !suspect)
    assert(!pub.exists(_._2 > Bench.StealThreshold))
  }

  test("publish: retry also stolen → merged fallback stays flagged") {
    val retryStalled = Seq((5.0, 0.20), (5.1, 0.22))
    val (pub, suspect) = Bench.publish(stalled, retryStalled)
    assert(pub == stalled ++ retryStalled && suspect)
  }

  test("publish: a spread-only suspect keeps its steal-clean fast min, still flagged") {
    // the 0.9 s rep ran at 0% steal — it is evidence of the real floor
    // and must not be discarded for the slower clean retry (that would
    // bias published minima upward); but the clean reps still disagree
    // by seconds, so the row stays suspect
    val first = Seq((0.9, 0.0), (3.0, 0.0))
    val (pub, suspect) = Bench.publish(first, clean)
    assert(pub.map(_._1).min == 0.9 && suspect)
  }

  test("publish: a stolen NON-min rep is dropped so it can't inflate the spread") {
    val oneStolen = Seq((1.20, 0.0), (3.30, 0.40), (1.22, 0.01))
    val (pub, suspect) = Bench.publish(oneStolen, Nil)
    assert(pub == Seq((1.20, 0.0), (1.22, 0.01)) && !suspect)
  }

  test("publish: flag ALWAYS equals suspectOf(published window)") {
    val spready = Seq((0.9, 0.0), (3.0, 0.0))
    for {
      first <- Seq(clean, stalled, spready, Seq.empty[(Double, Double)])
      retry <- Seq(Nil, clean, stalled, spready)
    } {
      val (pub, suspect) = Bench.publish(first, retry)
      assert(suspect == Bench.suspectOf(pub),
        s"first=$first retry=$retry pub=$pub")
      // and a non-suspect row never publishes a steal-tainted rep
      if (!suspect) assert(!pub.exists(_._2 > Bench.StealThreshold))
    }
  }
}
