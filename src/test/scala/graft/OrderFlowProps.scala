package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.ops.{Candles, OrderFlow}

/** SURVEY §5.3 invariants as ScalaCheck properties (the generated-input
  * upgrade of OrderFlowSpec's fixed cases):
  *
  *  - conservation: buy + sell = ltq, delta = buy − sell, exactly one
  *    side fills, for ANY book/tick geometry;
  *  - the tie rule: equidistant ticks classify BUY (`<=` beats `<`);
  *  - candle shape: low ≤ open, close ≤ high; open/close are the
  *    event-time-first/last values under the collision-free orderKey; the
  *    DECIMAL volume sum is exact.
  *
  * Generators use integer-valued doubles where EXACT float arithmetic is
  * part of the property (ties, sums): integers < 2^53 add/subtract
  * exactly in IEEE754, so "equidistant" and "Scala sum == engine sum"
  * are well-defined instead of 1-ulp flaky. Each evaluation ships a
  * whole generated batch through one Spark job, so the suite stays
  * seconds, not minutes. */
object OrderFlowProps extends Properties("graft.OrderFlow") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  // (ltp, ltq, best_bid, best_ask) around an arbitrary mid/spread
  private val tickGen: Gen[(Double, Int, Double, Double)] = for {
    mid  <- Gen.choose(10.0, 1000.0)
    half <- Gen.choose(0.01, 10.0)
    off  <- Gen.choose(-3.0, 3.0)
    ltq  <- Gen.choose(1, 100000)
  } yield (mid + off * half, ltq, mid - half, mid + half)

  property("conservation + single-side fill") =
    forAll(Gen.nonEmptyListOf(tickGen)) { cases =>
      import spark.implicits._
      val out = OrderFlow.classify(cases.toDF("ltp", "ltq", "best_bid", "best_ask"))
        .select("ltq", "buy_volume", "sell_volume", "delta").collect()
      out.length == cases.length && out.forall { r =>
        val (ltq, buy, sell, delta) =
          (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
        buy + sell == ltq && delta == buy - sell && (buy == 0 || sell == 0)
      }
    }

  // integer-valued doubles → the equidistance is exact, not 1-ulp flaky
  private val tieGen: Gen[(Double, Int, Double, Double)] = for {
    mid  <- Gen.choose(50, 5000).map(_.toDouble)
    half <- Gen.choose(1, 40).map(_.toDouble)
    ltq  <- Gen.choose(1, 100000)
  } yield (mid, ltq, mid - half, mid + half)

  property("equidistant tick classifies BUY") =
    forAll(Gen.nonEmptyListOf(tieGen)) { cases =>
      import spark.implicits._
      val out = OrderFlow.classify(cases.toDF("ltp", "ltq", "best_bid", "best_ask"))
        .select("ltq", "buy_volume", "sell_volume").collect()
      out.forall(r => r.getInt(1) == r.getInt(0) && r.getInt(2) == 0)
    }

  private val T0 = 1705309200000L // 2024-01-15 09:00:00 UTC
  // (instrument, epoch-ms offset within 3 windows, integer-valued price)
  private val candleTickGen: Gen[(String, Long, Double)] = for {
    instr <- Gen.oneOf("A", "B", "C")
    off   <- Gen.choose(0L, 3 * 60000L - 1)
    px    <- Gen.choose(1, 100000).map(_.toDouble)
  } yield (instr, off, px)

  property("candles: low <= open,close <= high; open/close/volume exact") =
    forAll(Gen.nonEmptyListOf(candleTickGen)) { ticks =>
      import spark.implicits._
      val rows = ticks.zipWithIndex.map { case ((instr, off, px), i) =>
        (i.toLong, new java.sql.Timestamp(T0 + off), instr, px)
      }
      val got = Candles.ohlc(rows.toDF("event_id", "ts", "instrument", "value"),
          col("ts"), col("event_id"), col("value"),
          Seq("instrument" -> col("instrument")), "1 minute")
        .collect()
        .map(r => (r.getAs[String]("instrument"),
                   r.getAs[java.sql.Timestamp]("window_start").getTime) ->
          (r.getAs[Double]("open"), r.getAs[Double]("high"),
           r.getAs[Double]("low"), r.getAs[Double]("close"),
           r.getAs[Double]("volume"), r.getAs[Long]("n_trades")))
        .toMap
      val expected = rows.groupBy { case (_, ts, instr, _) =>
        (instr, ts.getTime / 60000 * 60000)
      }
      got.keySet == expected.keySet && expected.forall { case (key, group) =>
        val (open, high, low, close, volume, n) = got(key)
        // the engine's orderKey: epoch-ms * 1e6 + id — replicate in Scala
        def ord(r: (Long, java.sql.Timestamp, String, Double)) =
          r._2.getTime * 1000000L + r._1
        val pxs = group.map(_._4)
        low <= open && open <= high && low <= close && close <= high &&
          high == pxs.max && low == pxs.min &&
          open == group.minBy(ord)._4 && close == group.maxBy(ord)._4 &&
          volume == pxs.sum && n == group.length
      }
    }
}
