package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.OrderFlow

/** Quote-rule classification semantics (reference: data_processor.py:136-140).
  * These invariants are NOT SQL-expressible gate material — they pin the
  * tie-break rule and conservation law the reference encodes with `<=` vs
  * `<`. */
class OrderFlowSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def classify(rows: Seq[(Double, Int, Double, Double)]) =
    OrderFlow.classify(
      rows.toDF("ltp", "ltq", "best_bid", "best_ask"))
      .select("buy_volume", "sell_volume", "delta")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))

  test("tick equidistant from both quotes classifies as BUY (<= beats <)") {
    // ltp=100 exactly between bid=99 and ask=101
    assert(classify(Seq((100.0, 7, 99.0, 101.0))) === Array((7, 0, 7)))
  }

  test("closer to ask → buy; closer to bid → sell") {
    assert(classify(Seq((100.9, 5, 99.0, 101.0))) === Array((5, 0, 5)))
    assert(classify(Seq((99.1, 5, 99.0, 101.0))) === Array((0, 5, -5)))
  }

  test("conservation: buy + sell = ltq and delta = buy - sell, exactly one side fills") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(200) {
      val mid  = 50 + rnd.nextDouble() * 100
      val half = 0.5 + rnd.nextDouble() * 5
      val ltp  = mid + (rnd.nextDouble() - 0.5) * 3 * half
      (ltp, rnd.nextInt(1000) + 1, mid - half, mid + half)
    }
    val out = classify(cases)
    out.zip(cases).foreach { case ((buy, sell, delta), (_, ltq, _, _)) =>
      assert(buy + sell === ltq)
      assert(delta === buy - sell)
      assert(buy === 0 || sell === 0)
      assert(buy > 0 || sell > 0)
    }
  }
}
