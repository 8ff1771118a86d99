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

  // The conservation law (buy + sell = ltq, delta = buy − sell, exactly
  // one side fills) is property-tested over GENERATED inputs in
  // OrderFlowProps (ScalaCheck), which replaced this spec's hand-rolled
  // Random loop; the fixed cases above pin the two boundary rules.
}
