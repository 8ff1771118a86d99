package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

/** Adversarial check of [[graft.ops.TimeJoins.asofJoin]]'s union-window
  * formulation against a brute-force witness, for random geometries that
  * hammer the tie rules the scaladoc promises:
  *
  *  - inclusive semantics: a quote AT the trade's instant is visible;
  *  - multiple quotes at the SAME instant: the highest event_id wins
  *    (the (ts, tag, eid) window order makes the last same-ts quote the
  *    running value);
  *  - trades with no preceding quote: null quote columns;
  *  - keys never bleed: quotes on other keys are invisible.
  *
  * Timestamps are drawn from a SMALL grid (0..12 seconds) so same-instant
  * collisions — quote/quote and quote/trade — occur in nearly every
  * generated case rather than almost never. */
object AsofProps extends Properties("graft.AsofJoin") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val T0 = 1705309200000L

  // (key, tsOffsetSec, value) — dense ts grid forces collisions
  private val evGen: Gen[(Int, Int, Int)] = for {
    k  <- Gen.choose(0, 2)
    ts <- Gen.choose(0, 12)
    v  <- Gen.choose(0, 999)
  } yield (k, ts, v)

  private val caseGen: Gen[(List[(Int, Int, Int)], List[(Int, Int, Int)])] =
    for {
      nq <- Gen.choose(0, 25)
      nt <- Gen.choose(1, 25)
      qs <- Gen.listOfN(nq, evGen)
      ts <- Gen.listOfN(nt, evGen)
    } yield (qs, ts)

  property("union-window as-of ≡ brute-force latest-quote-at-or-before") =
    forAll(caseGen) { case (qs, ts) =>
      import spark.implicits._
      def frame(xs: List[(Int, Int, Int)], base: Long) = xs.zipWithIndex.map {
        case ((k, off, v), i) =>
          (s"K$k", new Timestamp(T0 + off * 1000L), base + i, v.toDouble)
      }.toDF("user_id", "ts", "event_id", "value")
        .select(col("user_id"), col("ts").cast("timestamp_ntz").as("ts"),
                col("event_id"), col("value"))
      // disjoint id spaces; quote ids ascend with list order, so the
      // brute-force "max (ts, eid)" pick is well-defined
      val quotes = frame(qs, 0L)
      val trades = frame(ts, 1000000L)

      val got = ops.TimeJoins.asofJoin(trades, quotes, "user_id")
        .select(col("trade_id"), col("quote_value"))
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

      val expected = ts.zipWithIndex.map { case ((k, toff, _), i) =>
        val tid = 1000000L + i
        val cands = qs.zipWithIndex.filter { case ((qk, qoff, _), _) =>
          qk == k && qoff <= toff
        }
        val best = if (cands.isEmpty) None
        else Some(cands.maxBy { case ((_, qoff, _), qi) => (qoff, qi) })
        tid -> best.map(_._1._3.toDouble)
      }.toMap

      got == expected
    }
}
