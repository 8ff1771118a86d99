package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Sketch
import graft.ext.Sketch.KmvAgg

/** Sketch contracts — the bounded-memory, MERGEABLE alternatives to
  * exact distinct/percentile at 100 TB, in two families:
  *
  *  - the BUILT-IN approximate aggregates ([[graft.ops.Stats]]'s scale
  *    path): DuckDB's sketch implementations differ bit-for-bit, so
  *    these cannot be gate queries — the spec pins the properties that
  *    make them production-usable instead (error within the advertised
  *    bound against the exact gate answer, and sketch MERGE
  *    associativity — partial sketches per series union into the
  *    global estimate, which is precisely why one pass over 1000
  *    executors works);
  *  - [[ext.Sketch]]'s KMV distinct-count Aggregator, which IS
  *    gate-verified (deterministic set semantics): the bounded
  *    Aggregator must be EXACTLY the declarative k-smallest-distinct
  *    (same kth, same fill — a sketch that drifts from its own
  *    definition estimates the wrong thing), its buffers must stay
  *    bounded by k under adversarial reduce/merge order (the whole
  *    100 TB point), and the estimator's error at gate scale must sit
  *    inside the published KMV deviation. */
class SketchSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def events = Tables.events(spark, sfDir)

  test("approx_count_distinct lands within its rsd bound of the exact count") {
    val row = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), rsd = 0.05).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    // 0.05 is ONE standard deviation of the HLL estimator — allow 4σ
    assert(math.abs(approx - exact) <= math.max(1L, (4 * 0.05 * exact).toLong),
           s"exact=$exact approx=$approx")
  }

  test("HLL sketches built per series union to the global cardinality") {
    val perSeries = events.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = perSeries
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val exact = events.agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(merged - exact) <= math.max(1L, (0.1 * exact).toLong),
           s"exact=$exact merged-estimate=$merged")
  }

  test("approx_percentile brackets the exact discrete median") {
    val approx = events
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000)))
      .head().getDouble(0)
    // with accuracy 10000 on ~10⁴-10⁵ rows the estimate is near-exact;
    // assert it sits within the exact central band
    val Array(lo, hi) = events.agg(
      expr("percentile_disc(0.45) WITHIN GROUP (ORDER BY value)"),
      expr("percentile_disc(0.55) WITHIN GROUP (ORDER BY value)"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(approx >= lo && approx <= hi, s"median approx=$approx not in [$lo,$hi]")
  }

  private val rnd = new scala.util.Random(0xC0FFEE)

  test("reduce/merge ≡ set-union witness on random multisets; buffers bounded by k") {
    val agg = new KmvAgg(16)
    // three shards with heavy duplication and overlap
    val shards = Seq.fill(3)(Array.fill(500)(rnd.nextInt(64).toLong + 1))
    val partials = shards.map { sh =>
      var b = agg.zero
      sh.foreach { v =>
        b = agg.reduce(b, v)
        assert(b.length <= 16, "reduce grew past k")
        assert(b.sameElements(b.distinct.sorted), "buffer lost sortedness")
      }
      b
    }
    val merged = partials.reduce { (a, b) =>
      val m = agg.merge(a, b)
      assert(m.length <= 16, "merge grew past k")
      assert(m.sameElements(m.distinct.sorted))
      m
    }
    val want = shards.flatten.distinct.sorted.take(16)
    assert(merged.sameElements(want),
      s"sketch ${merged.toSeq} != witness ${want.toSeq}")
    val st = agg.finish(merged)
    assert(st.k_filled == want.length && st.kth == want.last)
    // empty corner: finish(zero) is well-defined
    assert(agg.finish(agg.zero) == Sketch.KmvState(0L, -1L))
  }

  test("merge is order-insensitive (sketch union semantics)") {
    val agg = new KmvAgg(8)
    val xs = Array.fill(200)(rnd.nextInt(40).toLong)
    val ys = Array.fill(200)(rnd.nextInt(40).toLong + 20)
    def build(vs: Array[Long]) = vs.foldLeft(agg.zero)(agg.reduce)
    val (a, b) = (build(xs), build(ys))
    assert(agg.merge(a, b).sameElements(agg.merge(b, a)))
    assert(agg.merge(a, agg.zero).sameElements(a))
  }

  test("distributed sketch ≡ the declarative k-smallest-distinct; error inside the KMV bound") {
    val row = Sketch.distinctKmv(spark, sfDir).collect().head
    // declarative witness: DISTINCT → ORDER BY → LIMIT k on the same
    // hash column (the oracle's spelling, run in-engine)
    val hv = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.WordWindowMd5(col("text"), lit(3)))
        .as("digest"))
      .select(conv(substring(col("digest"), 1, 12), 16, 10)
        .cast("long").as("hv"))
      .distinct()
    val want = hv.orderBy(col("hv")).limit(256).collect().map(_.getLong(0))
    assert(row.getLong(0) == want.length, "k_filled drifted")
    assert(row.getLong(1) == want.last, "kth drifted from the witness")
    // estimator sanity at gate scale: |D̂ − D|/D within 25% (expected
    // σ = 1/√(k−2) ≈ 6.3% at k=256; measured 12.7% on this corpus)
    assert(row.getLong(4) < 250000,
      s"KMV error ${row.getLong(4)} ppm — estimator wired wrong")
  }

  test("k-sweep rows are exact PREFIXES of one max-k sketch; k=256 row ≡ the single-k gate") {
    val sweep = ext.Sketch.distinctKmvSweep(spark, sfDir).collect()
    assert(sweep.map(_.getLong(0)).toSeq == Seq(64L, 128L, 256L, 512L))
    // declarative witness at max k once; every sweep row must be its
    // k-prefix (the sorted-set property the one-aggregate spelling
    // rides on)
    val want512 = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.WordWindowMd5(col("text"), lit(3)))
        .as("digest"))
      .select(conv(substring(col("digest"), 1, 12), 16, 10)
        .cast("long").as("hv"))
      .distinct().orderBy(col("hv")).limit(512).collect().map(_.getLong(0))
    sweep.foreach { r =>
      val k = r.getLong(0).toInt
      val prefix = want512.take(k)
      assert(r.getLong(1) == prefix.length, s"k=$k k_filled drifted")
      assert(r.getLong(2) == prefix.last, s"k=$k kth drifted")
      val est = if (prefix.length < k) prefix.length.toDouble
                else (k - 1).toDouble / (prefix.last.toDouble / 281474976710656.0)
      assert(r.getDouble(3) == est, s"k=$k estimator drifted")
    }
    // the k=256 sweep row must equal the standing single-k gate —
    // one spelling, two queries, no drift
    val single = ext.Sketch.distinctKmv(spark, sfDir).collect().head
    val r256 = sweep.find(_.getLong(0) == 256L).get
    assert(r256.getLong(1) == single.getLong(0) &&
           r256.getLong(2) == single.getLong(1) &&
           r256.getDouble(3) == single.getDouble(2) &&
           r256.getLong(4) == single.getLong(3) &&
           r256.getLong(5) == single.getLong(4),
      "sweep k=256 row drifted from the distinct_kmv gate")
  }

  test("grouped sketches union to the global sketch (the mergeability dividend)") {
    val agg = new KmvAgg(256)
    // per-lang k-min sets rebuilt locally from the distinct hash values
    val byLang = Tables.documents(spark, sfDir)
      .select(col("lang"),
        explode(graft.functions.WordWindowMd5(col("text"), lit(3)))
          .as("digest"))
      .select(col("lang"),
        conv(substring(col("digest"), 1, 12), 16, 10).cast("long").as("hv"))
      .distinct().collect()
      .groupBy(_.getString(0))
      .map { case (lang, rows) =>
        lang -> rows.map(_.getLong(1)).sorted.take(256)
      }
    // gate rows must equal the local per-lang sketches...
    val grouped = ext.Sketch.distinctKmvByLang(spark, sfDir).collect()
    assert(grouped.length == byLang.size)
    grouped.foreach { r =>
      val want = byLang(r.getString(0))
      assert(r.getLong(1) == want.length && r.getLong(2) == want.last,
        s"lang ${r.getString(0)} sketch drifted from the local witness")
    }
    // ...and their UNION must equal the global gate's sketch — the
    // property that lets per-shard sketches answer the corpus question
    // without a second scan
    val unioned = byLang.values.reduce(agg.merge)
    val global = ext.Sketch.distinctKmv(spark, sfDir).collect().head
    assert(agg.finish(unioned) ==
      ext.Sketch.KmvState(global.getLong(0), global.getLong(1)))
  }

  test("the sketch aggregates in a STREAM: bounded state, exact k-min across batches") {
    import TestSpark.spark.implicits._
    implicit def sqlContext: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val kmv = org.apache.spark.sql.functions.udaf(new KmvAgg(16))
    val q = in.toDF().select(col("value").as("hv"))
      .agg(kmv(col("hv")).as("s"))
      .select(col("s.k_filled").as("k_filled"), col("s.kth").as("kth"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      // batch 1: values 40..139; batch 2 overlaps and brings smaller ones
      in.addData(40L to 139L: _*)
      q.processAllAvailable()
      in.addData(1L to 60L: _*)
      q.processAllAvailable()
      val row = spark.sql("SELECT * FROM kmv_stream").collect().head
      // across both batches the 16 smallest distinct are 1..16 —
      // the streaming state is the ≤k sketch buffer, nothing more
      assert(row.getLong(0) == 16 && row.getLong(1) == 16L,
        s"streaming sketch drifted: $row")
    } finally q.stop()
  }

  test("underfilled sketch answers exactly (the KMV small-range rule)") {
    // k far above any language's distinct-window count: every group is
    // underfilled, and an underfilled buffer has seen EVERY distinct
    // value — the estimate must be k_filled itself, not (k−1)/h_k
    // (which would answer ≈ k−1 regardless of the truth)
    val rows = ext.Sketch.distinctKmvByLang(spark, sfDir, k = 1 << 20)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) < (1 << 20), "fixture unexpectedly filled k")
      assert(r.getDouble(3) == r.getLong(1).toDouble,
        s"lang ${r.getString(0)}: underfilled estimate not exact")
      // 48-bit hashes are collision-free at this corpus size, so the
      // exact-window audit column agrees with the hash-set count
      assert(r.getLong(1) == r.getLong(4))
    }
  }

  test("persisted-sketch cycle: write(A), merge sketch(B) ≡ one-pass sketch(A ∪ B)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    try {
      val hv = Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          explode(graft.functions.WordWindowMd5(col("text"), lit(3)))
            .as("digest"))
        .select(col("doc_id"),
          conv(substring(col("digest"), 1, 12), 16, 10).cast("long").as("hv"))
      val a = hv.filter(col("doc_id") % 2 === 0).select(col("hv"))
      val b = hv.filter(col("doc_id") % 2 =!= 0).select(col("hv"))
      Sketch.writeSketch(a, 64, s"$dir/sk")
      // artifact is engine-neutral and bounded: ≤ k BIGINT rows
      val stored = spark.read.parquet(s"$dir/sk")
      assert(stored.count() <= 64)
      val merged = Sketch.mergeSketch(spark, b, 64, s"$dir/sk")
      // one-pass witness over the union
      val kmv = org.apache.spark.sql.functions.udaf(new KmvAgg(64))
      val whole = hv.select(col("hv")).agg(kmv(col("hv")).as("s"))
        .select(col("s.k_filled"), col("s.kth")).collect().head
      assert(merged == Sketch.KmvState(whole.getLong(0), whole.getLong(1)),
        s"artifact cycle drifted: $merged vs $whole")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("scale shape: the sketch aggregate partial-aggregates; one output row") {
    val df = Sketch.distinctKmv(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // partial sketch buffers collapse map-side before the exchange
    assert(plan.contains("Partial") || plan.contains("partial"),
      plan.take(3000))
    assert(df.count() == 1)
  }
}
