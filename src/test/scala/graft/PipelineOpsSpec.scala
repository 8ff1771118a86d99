package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Corpus, Privacy, Text}
import graft.ops.BloomJoin

/** Round-10 training-pipeline operators: bloom semi-join reduction,
  * PII redaction, repetition-ratio quality, mixture epoch weighting.
  * Values are pinned by the DuckDB oracles; these tests pin the claims
  * the oracles can't see — pruning actually happens pre-join, redaction
  * is idempotent and residual-free, ratios respect their bounds, and
  * the mixture realizes the advertised per-domain copy counts. */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  // ---- bloom semi-join reduction -----------------------------------

  test("bloom pre-filter passes every matching key and prunes most others") {
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = BloomJoin.buildKeyFilter(urgent, "o_orderkey", 100000L, 0.03)
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"))
    val total = li.count()
    val passed = li.filter(BloomJoin.mightContain(bloom, col("l_orderkey"))).count()
    val exact = li.join(urgent, col("l_orderkey") === col("o_orderkey"),
                        "left_semi").count()
    assert(passed >= exact, "a bloom filter must never false-negative")
    // ~1/5 of orders are urgent; 3% fpp on the rest → well under half
    assert(passed < total / 2,
           s"bloom pruned nothing: passed=$passed of $total (exact=$exact)")
  }

  test("bloom-pruned join result is bit-identical to the plain join") {
    val plain = {
      val urgent = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).count()
        .orderBy(col("l_returnflag")).collect()
    }
    val pruned = BloomJoin.bloomPrunedJoin(spark, sfDir)
      .select(col("l_returnflag"), col("n_items")).collect()
    assert(pruned.map(r => (r.getString(0), r.getLong(1))).toSeq ===
             plain.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("bloom probe is the native expression inside the scan stage, not a UDF") {
    val plan = BloomJoin.bloomPrunedJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.contains("UDF"), plan)
    // the probe must sit BEFORE the join's exchange: the Filter line
    // carrying it appears below the parquet scan, not above the join
    val filterAt = plan.indexOf("might_contain")
    val joinAt = plan.indexOf("Join")
    assert(joinAt >= 0 && filterAt > joinAt,
           s"pre-filter should be on the scan side under the join:\n$plan")
  }

  // ---- PII redaction ------------------------------------------------

  test("redaction removes every match and is idempotent") {
    val df = Seq(
      (1L, "mail me at jane.doe+spam@corp.example.org today"),
      (2L, "call +1-555-0199 or +1-800-1234 now"),
      (3L, "server at 192.168.0.1 and 10.0.0.7 replied"),
      (4L, "no pii here at all"),
      (5L, "mixed: a@b.co +1-555-0000 1.2.3.4"))
      .toDF("id", "txt")
    val once = df.select(col("id"), Privacy.redact(col("txt")).as("r"))
    val res = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(res(1L) === "mail me at <EMAIL> today")
    assert(res(2L) === "call <PHONE> or <PHONE> now")
    assert(res(3L) === "server at <IP> and <IP> replied")
    assert(res(4L) === "no pii here at all")
    assert(res(5L) === "mixed: <EMAIL> <PHONE> <IP>")
    // no residual matches after one pass
    val residual = once.filter(
      col("r").rlike(Privacy.EmailPattern) ||
        col("r").rlike(Privacy.PhonePattern) ||
        col("r").rlike(Privacy.Ipv4Pattern)).count()
    assert(residual === 0)
    // second pass is a no-op
    val twice = once.select(col("id"), Privacy.redact(col("r")).as("r2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice === res)
  }

  test("pii_redact gate query finds the injected PII in every document") {
    val df = Privacy.piiRedact(spark, sfDir)
    assert(df.filter(col("n_emails") < 1 || col("n_phones") < 1 ||
                       col("n_ips") < 1).count() === 0)
  }

  // ---- repetition-ratio quality ------------------------------------

  test("repetition ratios: degenerate and all-distinct extremes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    Seq(
      (0L, "spam spam spam spam spam", "en", "unit", 24L),
      (1L, "all words here are fully distinct", "en", "unit", 33L),
      (2L, "one", "en", "unit", 3L)) // <2 words: excluded by contract
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = Text.textRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!rows.contains(2L))
    // 4 bigrams, all "spam spam" → 3 dups, ratio 0.75; top word is all 5
    assert(rows(0L).getLong(2) === 3L)
    assert(rows(0L).getDouble(3) === 0.75)
    assert(rows(0L).getDouble(4) === 1.0)
    // fully distinct text: no dup bigrams, top word 1/6
    assert(rows(1L).getLong(2) === 0L)
    assert(rows(1L).getDouble(3) === 0.0)
    assert(rows(1L).getDouble(4) === 1.0 / 6.0)
  }

  test("repetition bigram lambda indexes a materialized toks attribute") {
    // if CollapseProject re-inlines split(text) into the transform
    // lambda, the split re-runs per ARRAY ELEMENT (O(words²) per doc —
    // the measured 14× trap the native WordNGrams builder retired).
    // Per-ROW split copies in pushed-down filters are fine; a split
    // inside a lambdafunction(...) is the quadratic signature (each
    // optimized-plan node prints on one line, so line-local co-
    // occurrence is exactly "inside the lambda")
    val plan = Text.textRepetition(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    val bad = plan.linesIterator
      .filter(l => l.contains("lambdafunction") && l.contains("split(text"))
      .toSeq
    assert(bad.isEmpty, s"split inlined into a lambda:\n${bad.mkString("\n")}")
  }

  test("repetition ratios stay in [0, 1] on the corpus") {
    val bad = Text.textRepetition(spark, sfDir)
      .filter(col("dup_bigram_ratio") < 0 || col("dup_bigram_ratio") > 1 ||
                col("top_word_ratio") <= 0 || col("top_word_ratio") > 1)
      .count()
    assert(bad === 0)
  }

  // ---- decontamination ---------------------------------------------

  test("decontamination finds exactly the planted 3-gram overlaps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_decon").toString
    // benchmark doc: id 3 (3 % 97 == 3); doc 10 copies a 5-word span
    // (3 shared 3-grams), doc 200 shares nothing, doc 1 shares a
    // 3-word span (1 shared 3-gram)
    Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta", "en", "unit", 0L),
      (10L, "intro words then alpha beta gamma delta epsilon closing", "en", "unit", 0L),
      (200L, "completely different content with no common span", "en", "unit", 0L),
      (1L, "prefix alpha beta gamma suffix", "en", "unit", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = ext.Decontam.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
                                  r.getInt(4)))).toMap
    assert(got(10L) === ((3L, 1L, 3L, 0)))    // 3 shared, below threshold 5
    assert(got(1L) === ((1L, 1L, 3L, 0)))
    assert(!got.contains(200L))               // zero overlap → absent
    assert(!got.contains(3L))                 // benchmark excluded
  }

  test("substring decontamination flags exactly the planted verbatim spans") {
    val dir = java.nio.file.Files.createTempDirectory("graft_subst").toString
    val span = (1 to 8).map(i => s"w$i").mkString(" ") // one exact window
    // eval doc: id 3 (3 % 13 == 3); doc 10 quotes the full 8-token
    // window verbatim; doc 7 shares only 7 of its tokens (no full
    // window); doc 20 shares nothing
    Seq(
      (3L, s"eval preamble $span eval closing", "en", "unit", 0L),
      (10L, s"training text quoting $span and then more", "en", "unit", 0L),
      (7L, "w1 w2 w3 w4 w5 w6 w7 different tail here", "en", "unit", 0L),
      (20L, "completely unrelated training document body text", "en", "unit", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = CacheScope.scoped(spark) {
      ext.Decontam.decontaminateSubstr(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    assert(got(10L) === ((1L, 3L))) // one shared window, from eval doc 3
    assert(!got.contains(7L))       // 7-token partial overlap: clean
    assert(!got.contains(20L))
    assert(!got.contains(3L))       // eval doc itself excluded
  }

  test("decontamination broadcasts the benchmark side, never the corpus") {
    val plan = ext.Decontam.decontaminate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("temperature sampling: weights invert the size ordering, mass is conserved") {
    val rows = Corpus.langTemperatureSample(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byLang = rows.groupBy(_._1).view
      .mapValues(v => (v.head._2, v.head._3, v.map(_._4).sum)).toMap
    // α < 1 ⇒ smaller languages get strictly larger repeat weights
    val ordered = byLang.toSeq.sortBy(_._2._1)
    ordered.sliding(2).foreach {
      case Seq((_, (n1, w1, _)), (_, (n2, w2, _))) if n1 < n2 =>
        assert(w1 >= w2, s"weight not anti-monotone in size: $ordered")
      case _ =>
    }
    // expected post-sampling mass per language is q_l·N = n_l·w_l:
    // realized copies must land within the ±n_l quantization band
    byLang.foreach { case (lang, (nL, wPpm, copies)) =>
      val target = nL.toDouble * wPpm / 1e6
      assert(math.abs(copies - target) <= math.max(1.0, nL * 0.1),
        s"$lang realized $copies vs target $target")
    }
    // total mass ≈ corpus size (the w_l = q_l·N/n_l normalization)
    val total = byLang.values.map(_._3).sum.toDouble
    assert(math.abs(total - rows.length) <= rows.length * 0.05,
      s"total mass $total vs ${rows.length}")
  }

  test("embedding decontam agrees with a collected max-cosine witness") {
    val vs = Tables.embeddings(spark, sfDir)
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray
      }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val bench = vs.filter(_._1 % 97 == 3)
    val out = ext.Decontam.decontaminateEmb(spark, sfDir).collect()
    assert(out.length == vs.length - bench.length) // bench rows excluded
    out.foreach { r =>
      val v = vs.find(_._1 == r.getLong(0)).get._2
      val best = bench.map { case (bid, bv) => (cos(v, bv), bid) }
        .maxBy { case (c, bid) => (c, -bid) }
      assert(r.getLong(2) == best._2, s"argmax mismatch at ${r.getLong(0)}")
      assert(r.getLong(1) == math.floor(best._1 * 1e6).toLong,
        s"ppm mismatch at ${r.getLong(0)}")
      assert(r.getInt(3) == (if (best._1 >= 0.35) 1 else 0))
    }
  }

  // ---- length bucketing --------------------------------------------

  test("length buckets are ordered, balanced, and waste-bounded") {
    val rows = Corpus.lengthBuckets(spark, sfDir).collect()
    // within a worker, bucket ids are monotone in token count: every doc
    // in bucket b is <= every doc in bucket b+1
    rows.groupBy(_.getLong(1)).foreach { case (_, docs) =>
      val byBucket = docs.groupBy(_.getLong(3))
        .view.mapValues(_.map(_.getLong(2))).toMap
      byBucket.keys.toSeq.sorted.sliding(2).foreach {
        case Seq(a, b) => assert(byBucket(a).max <= byBucket(b).min ||
          // ntile may split equal lengths across adjacent tiles
          byBucket(a).max == byBucket(b).min,
          s"bucket $a overlaps $b")
        case _ =>
      }
      // ntile balance: sizes differ by at most 1
      val sizes = byBucket.values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"unbalanced tiles: $byBucket")
    }
    // pad_waste ∈ [0, 1) and zero for each bucket's longest doc
    assert(rows.forall(r => r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0))
    assert(rows.filter(r => r.getLong(2) == r.getLong(4))
               .forall(r => r.getDouble(5) === 0.0))
  }

  // ---- mixture epoch weighting -------------------------------------

  test("mixture realizes the per-domain copy targets and dense copy ids") {
    val out = Corpus.mixtureEpochs(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang")
    val whole = Map("en" -> 0L, "de" -> 2L, "zh" -> 3L, "fr" -> 1L, "es" -> 1L)
    val frac = Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.0, "fr" -> 0.0, "es" -> 0.5)
    // per-doc: n_copies ∈ {⌊w⌋, ⌊w⌋+1}; copy_idx dense 0..n-1
    val perDoc = out.groupBy(col("doc_id"), col("lang"), col("n_copies"))
      .agg(count(lit(1)).as("emitted"), max(col("copy_idx")).as("mx"),
           min(col("copy_idx")).as("mn")).collect()
    perDoc.foreach { r =>
      val (lang, n) = (r.getString(1), r.getLong(2))
      assert(n === r.getAs[Long]("emitted") && r.getAs[Long]("mn") === 0L &&
               r.getAs[Long]("mx") === n - 1, r.toString)
      assert(n === whole(lang) || n === whole(lang) + 1, r.toString)
    }
    // per-domain realized epoch factor ≈ target (md5 buckets are close
    // to uniform; ±15 percentage points absorbs small-corpus wobble)
    val perLang = out.groupBy(col("lang")).agg(count(lit(1)).as("copies"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDocs = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    nDocs.foreach { case (lang, n) =>
      val target = whole(lang) + frac(lang)
      val realized = perLang.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(realized - target) <= 0.15,
             s"$lang realized=$realized target=$target over $n docs")
    }
    out.unpersist()
  }
}
