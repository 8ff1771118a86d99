package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.Classifier]]'s trained-quality-filter contract:
  *
  *  - BIT-EXACT witness: an independent plain-Scala reimplementation of
  *    the whole pipeline (features → 8 GD rounds with fixed-point
  *    gradient sums → quantized weights/margins) must reproduce the
  *    distributed trainer's gate outputs exactly — the same style of
  *    brute-force witness the curation/dedup specs use, here covering
  *    every arithmetic spelling the DuckDB oracle also depends on;
  *  - the distillation LEARNS: apply-path agreement with the Gopher
  *    labels must beat the majority-class baseline (a trainer that
  *    diverged or zeroed out would still hash-match a broken oracle —
  *    this pins that the model is a working classifier, not just a
  *    deterministic number generator);
  *  - scale-shape pins: the weights ride broadcasts (never a driver
  *    collect), the gradient aggregate collapses map-side, and the
  *    apply path is window-free.
  */
class ClassifierSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  // ---- the independent witness: features + GD in plain Scala ----

  private val Stops =
    Seq("the", "a", "be", "to", "of", "and", "that", "have", "with")

  /** (y, x) per doc, same spellings as [[ext.Classifier.featureFrame]]:
    * split keeps empty tokens (Spark `split` semantics), alpha check is
    * ASCII-only (the `[a-zA-Z]` rlike), divisions in the same order. */
  private def localFeatures(text: String): (Long, Array[Double]) = {
    val toks = text.split(" ", -1)
    val wc = toks.length
    val sumLen = toks.map(_.length).sum
    val meanWlen = sumLen.toDouble / wc
    val nSym = toks.count(t => t.contains("#") || t.contains("..."))
    val nAlpha = toks.count(_.exists(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
    val distinct = toks.distinct
    val nStops = Stops.count(distinct.contains)
    val pass = wc >= 50 && wc <= 100000 &&
      meanWlen >= 3.0 && meanWlen <= 10.0 &&
      nSym.toDouble / wc <= 0.1 &&
      nAlpha.toDouble / wc >= 0.8 &&
      nStops >= 2
    val ttr = distinct.length.toDouble / wc
    (if (pass) 1L else 0L,
     Array(1.0, wc.toDouble / 100.0, meanWlen / 10.0,
           nStops.toDouble / 9.0, ttr))
  }

  /** 8 GD rounds, left-to-right dots, fixed-point gradient sums —
    * returns (final weights, final round's qsums). */
  private def localTrain(rows: Array[(Long, Array[Double])])
      : (Array[Double], Array[Long]) = {
    val d = 5
    val w = Array.fill(d)(0.0)
    var lastQ: Array[Long] = null
    for (_ <- 1 to 8) {
      val qsum = Array.fill(d)(0L)
      rows.foreach { case (y, x) =>
        var z = 0.0
        var i = 0
        while (i < d) { z += x(i) * w(i); i += 1 }
        val p = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
        i = 0
        while (i < d) {
          qsum(i) += math.floor((p - y.toDouble) * x(i) * 1000000.0).toLong
          i += 1
        }
      }
      var i = 0
      while (i < d) {
        w(i) = w(i) - 0.5 * (qsum(i).toDouble / 1e6 / rows.length)
        i += 1
      }
      lastQ = qsum
    }
    (w, lastQ)
  }

  private lazy val corpus: Array[(Long, String)] =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)

  test("train gate ≡ the plain-Scala witness, bit-exact (qsum, n, qw)") {
    val rows = corpus.map { case (_, t) => localFeatures(t) }
    val (w, qsum) = localTrain(rows)
    val got = ext.Classifier.qualityClfTrain(spark, sfDir).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val dim = r.getLong(0).toInt
      assert(r.getLong(1) == qsum(dim),
        s"dim $dim qsum ${r.getLong(1)} != witness ${qsum(dim)}")
      assert(r.getLong(2) == rows.length)
      assert(r.getLong(3) == math.floor(w(dim) * 1000000.0).toLong,
        s"dim $dim qw ${r.getLong(3)} != witness of w=${w(dim)}")
    }
  }

  test("apply gate ≡ the witness margins; the distilled model beats the majority baseline") {
    val feats = corpus.map { case (id, t) => id -> localFeatures(t) }.toMap
    val (w, _) = localTrain(corpus.map { case (_, t) => localFeatures(t) })
    val got = ext.Classifier.qualityClfApply(spark, sfDir).collect()
    assert(got.length == corpus.length)
    var nCorrect = 0L
    var nPos = 0L
    got.foreach { r =>
      val (y, x) = feats(r.getLong(0))
      var z = 0.0
      var i = 0
      while (i < 5) { z += x(i) * w(i); i += 1 }
      assert(r.getLong(1) == y)
      assert(r.getLong(2) == math.floor(z * 1000000.0).toLong,
        s"doc ${r.getLong(0)} zq mismatch")
      assert(r.getInt(3) == (if (z >= 0) 1 else 0))
      assert(r.getInt(4) == (if ((z >= 0) == (y == 1L)) 1 else 0))
      nCorrect += r.getInt(4)
      nPos += y
    }
    val n = got.length.toDouble
    val baseline = math.max(nPos, got.length - nPos) / n
    val acc = nCorrect / n
    // measured 0.87 at sf0.001/sf0.01 vs ~0.53 baseline; the floor has
    // slack because the point is LEARNED > DEGENERATE, not a benchmark
    assert(acc > baseline + 0.05,
      s"distillation did not learn: acc $acc vs baseline $baseline")
  }

  test("frozen-model apply: history-trained weights, bit-exact, generalize to the unseen increment") {
    val byId = corpus.toMap
    val (w, _) = localTrain(
      corpus.filter(_._1 % 5 != 0).map { case (_, t) => localFeatures(t) })
    val got = ext.Classifier.qualityClfFrozen(spark, sfDir).collect()
    assert(got.length == corpus.count(_._1 % 5 == 0))
    var nCorrect = 0L
    var nPos = 0L
    got.foreach { r =>
      val id = r.getLong(0)
      assert(id % 5 == 0, s"history doc $id leaked into the increment")
      val (y, x) = localFeatures(byId(id))
      var z = 0.0
      var i = 0
      while (i < 5) { z += x(i) * w(i); i += 1 }
      assert(r.getLong(1) == y)
      assert(r.getLong(2) == math.floor(z * 1000000.0).toLong,
        s"doc $id zq under frozen weights drifted")
      nCorrect += r.getInt(4)
      nPos += y
    }
    // the licensing number: agreement on documents the trainer never
    // saw (measured 0.84 vs 0.51 baseline at sf0.001/sf0.01)
    val n = got.length.toDouble
    val baseline = math.max(nPos, got.length - nPos) / n
    assert(nCorrect / n > baseline + 0.05,
      s"frozen model failed to generalize: ${nCorrect / n} vs $baseline")
  }

  test("threshold sweep ≡ witness confusion counts; cutoff monotonicity holds") {
    val (w, _) = localTrain(corpus.map { case (_, t) => localFeatures(t) })
    val zqs = corpus.map { case (_, t) =>
      val (y, x) = localFeatures(t)
      var z = 0.0
      var i = 0
      while (i < 5) { z += x(i) * w(i); i += 1 }
      (y, math.floor(z * 1000000.0).toLong)
    }
    val rows = ext.Classifier.qualityClfSweep(spark, sfDir).collect()
    assert(rows.length == 5)
    var prevTp = Long.MaxValue
    var prevFp = Long.MaxValue
    rows.foreach { r =>
      val t = r.getLong(0)
      val tp = zqs.count { case (y, zq) => zq >= t && y == 1L }.toLong
      val fp = zqs.count { case (y, zq) => zq >= t && y == 0L }.toLong
      val fn = zqs.count { case (y, zq) => zq < t && y == 1L }.toLong
      val tn = zqs.count { case (y, zq) => zq < t && y == 0L }.toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((tp, fp, fn, tn)), s"confusion counts drifted at t=$t")
      assert(tp + fp + fn + tn == corpus.length)
      if (tp + fp > 0)
        assert(r.getDouble(5) == tp.toDouble / (tp + fp))
      else assert(r.isNullAt(5))
      // raising the cutoff can only shrink the predicted-positive set
      assert(tp <= prevTp && fp <= prevFp, s"monotonicity broke at t=$t")
      prevTp = tp; prevFp = fp
    }
  }

  test("slice sweep: p=100 anchors at perfect self-agreement; smaller slices stay close but differ") {
    val rows = ext.Classifier.qualityClfSlice(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(25L, 50L, 100L))
    val n = Tables.documents(spark, sfDir).count()
    // slice sizes: the hash buckets take roughly p% of the corpus, and
    // p=100 takes exactly all of it
    val Seq(r25, r50, r100) = rows.toSeq
    assert(r100._2 == n)
    assert(r25._2 > 0 && r25._2 < r50._2 && r50._2 < r100._2)
    // the anchor row IS the reference model: agreement 10^6 ppm, gap 0
    assert(r100._4 == 1000000L && r100._5 == 0L)
    // the measurement the posture claim rests on: a quarter-corpus
    // model still predicts like the full model on the overwhelming
    // majority of docs (measured 89.4% at sf0.001, 98.2% at sf0.01 —
    // the bound detects collapse, it does not restate the measurement)
    assert(r25._4 >= 850000L, s"p=25 agreement collapsed: ${r25._4}")
    assert(r50._4 >= r25._4 - 50000L, "agreement curve wildly non-monotone")
    // ...but it IS a different model (a zero margin gap would mean the
    // slice never changed the weights — the measurement would be fake)
    assert(r25._5 > 0L && r50._5 > 0L)
    // label accuracy stays in the working band at every p
    assert(rows.forall(r => r._3 >= 700000L),
      s"slice model stopped classifying: $rows")
  }

  test("scale shape: weights broadcast, gradient collapses map-side, apply is window-free") {
    val applyPlan = ext.Classifier.qualityClfApply(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(applyPlan.contains("Broadcast"), applyPlan.take(2000))
    assert(!applyPlan.contains("Window"), applyPlan.take(2000))
    assert(!applyPlan.contains("CollectLimit"), applyPlan.take(2000))
    // the per-dim gradient aggregate must partial-aggregate before the
    // exchange (O(dims × partitions) shuffled rows, not O(docs)) — pin
    // the ROUND STEP's own plan: the gate plan only sees the step's
    // checkpointed result, so the aggregate shape must be read here
    val feats = ext.Classifier.featureFrame(Tables.documents(spark, sfDir))
    val w0 = spark.range(1)
      .select(array(Seq.fill(5)(lit(0.0)): _*).as("w"))
    val stepPlan = ext.Classifier.gradStep(feats, w0)
      .queryExecution.executedPlan.toString
    assert(stepPlan.contains("partial_sum") || stepPlan.contains("Partial"),
      stepPlan.take(3000))
    assert(stepPlan.contains("Broadcast"), stepPlan.take(3000))
  }
}
