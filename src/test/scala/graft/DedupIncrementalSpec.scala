package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.Dedup.dedupIncremental]]'s funnel semantics beyond the
  * DuckDB gate: the bloom pre-filter must be invisible in the RESULT
  * (no false negatives — every verified cross-split pair surfaces in
  * the manifest), the manifest must account consistently, and the
  * bloom probe must sit in the plan as a scan-side filter. */
class DedupIncrementalSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def run[T](body: => T): T = CacheScope.scoped(spark)(body)

  test("manifest invariants: one row per new doc; kept ⇔ no verified dup") {
    run {
      val rows = ext.Dedup.dedupIncremental(spark, sfDir).collect()
      val nNew = Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 5 === 0).count()
      assert(rows.length == nNew)
      rows.foreach { r =>
        val (n, kept) = (r.getLong(1), r.getBoolean(3))
        assert(kept == (n == 0), r.toString)
        assert(r.isNullAt(2) == kept, r.toString) // dup_of iff dup
      }
    }
  }

  test("no false negatives: every cross-split verified LSH pair is caught") {
    run {
      // the full self-join dedup is the ground truth; restrict its
      // verified pairs to (history, new) splits and demand each new
      // endpoint be flagged with dup_of ≤ the pair's history doc
      val pairs = ext.Dedup.dedupMinhashLsh(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val manifest = ext.Dedup.dedupIncremental(spark, sfDir).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
      val crossPairs = pairs.flatMap { case (a, b) =>
        (a % 5, b % 5) match {
          case (0, h) if h != 0 => Some(a -> b) // new=a, hist=b
          case (h, 0) if h != 0 => Some(b -> a) // new=b, hist=a
          case _                => None
        }
      }
      assert(crossPairs.nonEmpty, "fixture lost its cross-split near-dups")
      crossPairs.groupBy(_._1).foreach { case (newDoc, ps) =>
        val (n, dupOf) = manifest(newDoc)
        assert(n >= ps.length, s"doc $newDoc missed dups: $n < ${ps.length}")
        assert(dupOf.exists(_ <= ps.map(_._2).min), s"doc $newDoc: $dupOf")
      }
    }
  }

  test("embedding manifest: sound (every reported dup is a true ≥0.3 " +
       "pair), invariant-consistent, recall measured vs brute force") {
    run {
      import org.apache.spark.sql.functions.{col => c}
      val vecs = Tables.embeddings(spark, sfDir)
        .select(c("vec_id"), ext.Vectors.asDouble(c("embedding")).as("v"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      def cos(a: Array[Double], b: Array[Double]) = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val brute = for {
        (bid, bv) <- vecs.toSeq if bid % 5 == 0
        (hid, hv) <- vecs.toSeq if hid % 5 != 0
        if cos(bv, hv) >= 0.3
      } yield (bid, hid)
      val bruteByB = brute.groupBy(_._1)
      val manifest = ext.Dedup.dedupEmbIncremental(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1),
                   if (r.isNullAt(2)) None else Some(r.getLong(2)),
                   r.getBoolean(3)))
      assert(manifest.length == vecs.keys.count(_ % 5 == 0))
      manifest.foreach { case (bid, n, dupOf, kept) =>
        assert(kept == (n == 0), s"$bid")
        assert(dupOf.isDefined == !kept, s"$bid")
        // SOUNDNESS is exact: the verify is true cosine, so a reported
        // dup_of must be a real ≥0.3 neighbor, and the count can never
        // exceed the brute count
        dupOf.foreach { h =>
          assert(cos(vecs(bid), vecs(h)) >= 0.3, s"$bid -> $h not a dup")
        }
        assert(n <= bruteByB.get(bid).map(_.size).getOrElse(0),
               s"$bid overcounts: $n")
      }
      // completeness is the ANN contract — measure, don't assume
      val flagged = manifest.count(!_._4)
      val withTrue = bruteByB.size
      info(f"embedding incremental recall (probe 2/8 cells): " +
           f"$flagged of $withTrue batch vectors with true dups")
      if (withTrue > 0)
        assert(flagged > 0, "probe found none of the existing near-dups")
    }
  }

  test("embedding manifest plan: probe side broadcasts; no cartesian " +
       "on the verify path") {
    run {
      val plan = ext.Dedup.dedupEmbIncremental(spark, sfDir)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
             "cell-restricted verify must probe via a broadcast join")
      assert(!plan.contains("CartesianProduct"), "verify path cartesian-exploded")
    }
  }

  test("plan: bloom probe guards the band join; history bands join once") {
    run {
      val plan = ext.Dedup.dedupIncremental(spark, sfDir)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("might_contain"), plan.take(500))
      // the funnel plans exactly two joins on the band/shingle path
      // plus the manifest left join — never a cartesian
      assert(!plan.contains("CartesianProduct"), plan.take(500))
    }
  }
}
