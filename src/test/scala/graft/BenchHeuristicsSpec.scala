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
  // steal_frac > threshold on a row NOT in stall_suspect)

  private val stalled = Seq((6.7, 0.30), (6.8, 0.28), (6.7, 0.31))
  private val clean = Seq((1.20, 0.0), (1.25, 0.01), (1.22, 0.0))

  test("publish: no retry window passes the first window through") {
    assert(Bench.publish(clean, Nil) == ((clean, false)))
    assert(Bench.publish(stalled, Nil) == ((stalled, true)))
  }

  test("publish: a clean retry REPLACES a stalled first window") {
    // the stalled reps (including their steal-tainted min) must not
    // leak into the published stats of a non-suspect row
    val (pub, suspect) = Bench.publish(stalled, clean)
    assert(pub == clean && !suspect)
    assert(!pub.exists(_._2 > Bench.StealThreshold))
  }

  test("publish: a retry that is itself suspect publishes merged, flagged") {
    val retryStalled = Seq((5.0, 0.20), (5.1, 0.22))
    val (pub, suspect) = Bench.publish(stalled, retryStalled)
    assert(pub == stalled ++ retryStalled && suspect)
  }

  test("publish: published-window invariant — flag matches suspectOf(published)") {
    for {
      first <- Seq(clean, stalled)
      retry <- Seq(Nil, clean, stalled)
    } {
      val (pub, suspect) = Bench.publish(first, retry)
      // a flagged row may only carry untrustworthy stats; an unflagged
      // row's published window must itself test non-suspect
      assert(suspect == Bench.suspectOf(pub) || suspect)
      if (!suspect) assert(!Bench.suspectOf(pub))
    }
  }
}
