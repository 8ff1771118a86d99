package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ext.LangModel]]'s semantics beyond the DuckDB hash gate:
  * the score must actually ORDER documents by model fit (fluent text
  * under the trained bigram model scores lower NLL than shuffled
  * text), short documents are excluded by the bigram convention, the
  * tertile buckets partition the corpus, and the scoring plan keeps
  * the model on the build/broadcast side. */
class LangModelSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def score(rows: (Long, String)*) = CacheScope.scoped(spark) {
    ext.LangModel.scoreFrame(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
  }

  test("repeated in-model bigrams score lower NLL than one-off bigrams") {
    // docs 1-3 share the same frequent bigrams (x→y count 9, y→x
    // count 6 under the self-trained model); doc 4's bigrams are all
    // count-1 with count-1 contexts, so its smoothed probabilities
    // are ≈ 2/(1+V) ≪ docs 1-3's ≈ 10/11 — strictly higher mean NLL
    val common = Seq.fill(3)("x y").mkString(" ")
    val m = score(
      1L -> common, 2L -> common, 3L -> common,
      4L -> "p q r s t u")
    assert(m(1L)._1 == m(2L)._1 && m(2L)._1 == m(3L)._1)
    assert(m(4L)._1 > m(1L)._1,
      s"rare-bigram doc not penalized: ${m(4L)._1} vs ${m(1L)._1}")
  }

  test("sub-bigram documents are excluded; buckets partition the corpus") {
    val m = score(
      1L -> "a b a b", 2L -> "a b c d", 3L -> "q r s t",
      4L -> "lonely", 5L -> "")
    assert(!m.contains(4L) && !m.contains(5L))
    assert(m.values.map(_._2).forall(Set("head", "middle", "tail")))
    // scores are distinct here, so tertiles must use all three labels
    assert(m.values.map(_._2).toSet.size == 3, m.toString)
  }

  test("bucket thresholds are inclusive-ordered: head ≤ middle ≤ tail by score") {
    val out = CacheScope.scoped(spark) {
      ext.LangModel.lmPerplexity(spark, sfDir)
        .select(col("bucket"), col("nll_ppm")).collect()
        .map(r => r.getString(0) -> r.getLong(1))
    }
    def rng(b: String) = { val v = out.collect { case (`b`, s) => s }; (v.min, v.max) }
    val (h, m, t) = (rng("head"), rng("middle"), rng("tail"))
    assert(h._2 <= m._1 && m._2 <= t._1,
      s"bucket ranges interleave: head=$h middle=$m tail=$t")
    // tertile balance: no bucket may hold more than half the corpus
    val n = out.length
    Seq("head", "middle", "tail").foreach { b =>
      val c = out.count(_._1 == b)
      assert(c > 0 && c <= n / 2 + 1, s"$b holds $c of $n")
    }
  }

  test("self-trained path ≡ scoreWith(self model): bit parity") {
    CacheScope.scoped(spark) {
      val docs = Tables.documents(spark, sfDir)
      val a = ext.LangModel.scoreFrame(docs).collect().map(_.toSeq)
      val b = ext.LangModel
        .scoreWith(docs, ext.LangModel.trainBigramModel(docs))
        .collect().map(_.toSeq)
      assert(a.sameElements(b))
    }
  }

  test("external model round-trips parquet; OOV docs smooth to ln(V), never drop") {
    val dir = java.nio.file.Files.createTempDirectory("lm_model").toString
    CacheScope.scoped(spark) {
      val ref = Seq.tabulate(3)(i => (i.toLong, "x y x y x y"))
        .toDF("doc_id", "text")
      ext.LangModel.trainBigramModel(ref).write.mode("overwrite").parquet(dir)
      val model = spark.read.parquet(dir)
      val out = ext.LangModel.scoreWith(
        Seq((10L, "x y x y"), (11L, "p q r s")).toDF("doc_id", "text"),
        model).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // doc 11's bigrams are all OOV: every term is ln(1/V) with the
      // model vocab V = {x, y} = 2 — mean NLL is ln(2) under the
      // per-term ppm quantization (each ln term floors to ppm LONGs
      // before the exact sum), and the doc SURVIVES (3 bigrams)
      // instead of dropping from the join
      assert(out(11L)._1 == 3L)
      val termPpm = math.floor(math.log(0.5) * 1e6).toLong
      assert(out(11L)._2 == math.floor(-(3L * termPpm).toDouble / 3L).toLong)
      // doc 10 is pure in-model text: strictly better than OOV
      assert(out(10L)._2 < out(11L)._2)
    }
  }

  test("per-language buckets are tertiles WITHIN each language") {
    val out = CacheScope.scoped(spark) {
      ext.LangModel.lmPerplexityByLang(spark, sfDir).collect()
        .map(r => (r.getString(1), r.getString(4), r.getLong(3)))
    }
    out.groupBy(_._1).foreach { case (lang, rows) =>
      // band ordering holds inside the language
      def rng(b: String) = {
        val v = rows.collect { case (_, `b`, s) => s }
        if (v.isEmpty) None else Some((v.min, v.max))
      }
      (rng("head"), rng("middle")) match {
        case (Some(h), Some(m)) => assert(h._2 <= m._1, s"$lang: $h vs $m")
        case _                  =>
      }
      (rng("middle"), rng("tail")) match {
        case (Some(m), Some(t)) => assert(m._2 <= t._1, s"$lang: $m vs $t")
        case _                  =>
      }
      // no language collapses into one global bucket (the CCNet point:
      // thresholds are per-language, so every language keeps a head)
      assert(rows.exists(_._2 == "head"), s"$lang lost its head bucket")
    }
  }

  test("scoreDocs runs as a foreachBatch kernel: stream ≡ batch against the stored model") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext
    val modelDir = java.nio.file.Files.createTempDirectory("lm_m").toString
    CacheScope.scoped(spark) {
      ext.LangModel.trainBigramModel(
          Seq((0L, "x y x y x y"), (1L, "x y z")).toDF("doc_id", "text"))
        .write.mode("overwrite").parquet(modelDir)
    }
    val model = spark.read.parquet(modelDir)
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the batch kernel, verbatim — scoring is per-document, so the
        // increment path needs no state store and no watermark
        CacheScope.scoped(batch.sparkSession) {
          got ++= ext.LangModel.scoreDocs(batch, model)
            .collect().map(_.toString)
        }; ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("lm_s").toString)
      .start()
    try {
      input.addData((10L, "x y x y"), (11L, "p q r"))
      q.processAllAvailable()
      input.addData((12L, "x y z"))
      q.processAllAvailable()
    } finally q.stop()
    val batchAll = CacheScope.scoped(spark) {
      ext.LangModel.scoreDocs(
        Seq((10L, "x y x y"), (11L, "p q r"), (12L, "x y z"))
          .toDF("doc_id", "text"), model)
        .collect().map(_.toString)
    }
    assert(got.sorted.toSeq == batchAll.sorted.toSeq)
  }

  test("scoring plan: model joins broadcast at gate scale, nothing cartesian-explodes") {
    CacheScope.scoped(spark) {
      val plan = ext.LangModel.lmPerplexity(spark, sfDir)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(600))
      // the only nested-loop joins are the broadcast 1-row frames
      // (vocab count, tertile bounds) — a real cartesian would pair
      // O(tokens) rows
      assert(!plan.contains("CartesianProduct"), plan.take(600))
    }
    assert(CacheScope.livePinned(spark) == 0)
  }
}
