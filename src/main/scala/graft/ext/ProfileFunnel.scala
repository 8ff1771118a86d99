package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Component profiler for the composed gates (r21 measurement tooling;
  * not part of the driver surface): times each expensive query's
  * constituent pipelines in isolation with the noop sink (guide §1.4),
  * warmup discarded, min of 2. This is how the funnel's
  * tautological-URL-join and the emb-history small-files findings were
  * located; kept so the next optimization round starts from numbers,
  * not archaeology. */
object ProfileFunnel {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.Sessions.quietBenchLogs()
    val spark = graft.Sessions.local(cpus)
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      graft.CacheScope.release(spark); spark.catalog.clearCache(); System.gc()
      val ts = (0 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-28s min ${ts.drop(1).min}%.3f s  reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def timeU(name: String)(f: => Unit): Unit = {
      graft.CacheScope.release(spark); spark.catalog.clearCache(); System.gc()
      val ts = (0 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-28s min ${ts.drop(1).min}%.3f s  reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))

    // --- per-JOB trace of one query (r22): job wall-clock + stage/task
    // counts, cold-cache, after one warmup — attributes a composed
    // gate's time to its eager materialization jobs vs the final action
    if (args.headOption.contains("jobs")) {
      val qname = args(1)
      val fn = graft.SparkEntry.queries(qname)
      val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val d = Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse("")
            starts.put(js.jobId, (System.nanoTime(), d)); ()
          }
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val (t0, d) = starts.getOrDefault(je.jobId, (0L, ""))
            jobs.add(f"job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $d")
            ()
          }
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            jobs.add(f"  stage ${i.stageId}%3d tasks=${i.numTasks}%3d " +
              f"${(i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3}%6.3f s " +
              i.name.take(60))
            ()
          }
        })
      // warmup (codegen/JIT), then one traced cold-cache run
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.CacheScope.release(spark); spark.catalog.clearCache(); System.gc()
      jobs.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      jobs.forEach(s => println(s"[jobs] $s"))
      println(f"[jobs] TOTAL $qname $el%.3f s, ${jobs.size} jobs")
      spark.stop()
      return
    }

    // --- funnel per-stage decomposition (r22: VERDICT item 1) — each
    // flag pipeline in isolation, then the composed funnels
    if (args.contains("funnel")) {
      val full = graft.Tables.documents(spark, sfDir)
      time("urls_keepFlags") {
        Urls.keepFlags(full.select(col("doc_id"), col("source")))
      }
      time("exact_keep_agg") {
        full.select(md5(col("text")).as("digest"), col("doc_id"))
          .groupBy(col("digest")).agg(min(col("doc_id")).as("keeper"))
      }
      time("lsh_pairs") {
        Dedup.lshPairs(spark, sfDir).select(col("doc_a"), col("doc_b"))
      }
      time("cc_labels") {
        Cluster.connectedComponents(
          full.select(col("doc_id").as("id")),
          Dedup.lshPairs(spark, sfDir)
            .select(col("doc_a").as("src"), col("doc_b").as("dst")))
      }
      time("gopher_flags") { Text.gopherFlags(docs) }
      time("contamination") { Decontam.contaminationFrame(spark, sfDir) }
      time("lm_buckets_of") { LangModel.bucketsOf(docs) }
      time("scoring_scored") { Scoring.scored(docs) }
      time("corpus_funnel_full") { Funnel.corpusFunnel(spark, sfDir) }
      time("funnel_by_lang_full") { Funnel.corpusFunnelByLang(spark, sfDir) }
      // incremental components
      val isNewDoc = col("doc_id") % Dedup.IncrMod === 0
      time("incr_manifest") { Dedup.incrementalManifest(spark, sfDir) }
      time("incr_lm_train_hist") {
        LangModel.trainBigramModel(docs.filter(!isNewDoc))
      }
      time("incr_lm_buckets_with") {
        LangModel.bucketsWith(docs.filter(isNewDoc),
          LangModel.trainBigramModel(docs.filter(!isNewDoc)))
      }
      time("incremental_funnel_full") { Funnel.incrementalFunnel(spark, sfDir) }
      spark.stop()
      return
    }

    if (!args.contains("stream")) {
    // --- LangModel decomposition
    time("lm_train_model") { LangModel.trainBigramModel(docs) }
    time("lm_buckets") { LangModel.bucketsOf(docs) }
    time("lm_perplexity_full") { LangModel.lmPerplexity(spark, sfDir) }
    time("lm_perplexity_lang_full") { LangModel.lmPerplexityByLang(spark, sfDir) }

    // --- emb probe decomposition
    val isNew = col("vec_id") % Dedup.IncrMod === 0
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
    timeU("embhist_write") {
      val art = graft.ops.Export.scratch("graft_prof_emb")
      EmbHistory.write(vecs.filter(!isNew), art, 8, 4)
    }
    time("emb_probe_full") { EmbHistory.dedupEmbProbe(spark, sfDir) }

    // --- substr pair
    time("substr_spans_full") { Curation.substrDupSpans(spark, sfDir) }
    time("substr_apply_full") { Curation.substrDedupApply(spark, sfDir) }

    // --- simhash pairs / ngram jaccard
    time("simhash_pairs_full") { Dedup.dedupSimhashPairs(spark, sfDir) }
    time("ngram_jaccard_full") { Dedup.dedupNgramJaccard(spark, sfDir) }
    }

    // --- streaming vec-ingest micro-batch decomposition (StreamBench's
    // vec_dedup leg shape: 100k-vector frozen history, 10k-vector batch)
    if (args.contains("stream")) {
      val histN = 100000L
      val batchN = 10000L
      val art = graft.ops.Export.scratch("graft_prof_vecstream")
      val cells = math.max(8L, math.round(math.sqrt(histN.toDouble))).toInt
      EmbHistory.write(
        graft.stream.Sources.nearDupVecs(spark.range(histN).toDF(), col("id"), 0L),
        art, k = cells)
      val hist = EmbHistory.pinned(EmbHistory.read(spark, art))
      val batch = graft.stream.Sources.nearDupVecs(
        spark.range(batchN).toDF(), col("id"), 1000000000000L)
      def scoped(name: String)(f: (org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame): Unit = {
        val ts = (0 to 2).map { _ =>
          val eph = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
          val track = (df: org.apache.spark.sql.DataFrame) => {
            val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            eph += p; p
          }
          val t0 = System.nanoTime()
          f(track).write.format("noop").mode("overwrite").save()
          val el = (System.nanoTime() - t0) / 1e9
          eph.foreach(_.unpersist(blocking = false))
          el
        }
        println(f"[prof] $name%-28s min ${ts.drop(1).min}%.3f s  reps=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
      scoped("vs_manifest_only") { track =>
        EmbHistory.manifestAgainst(
          track(EmbHistory.withNorm(batch.select(col("vec_id"), col("v")))),
          hist.coarse, hist.vectors, 2, 0.8, track)
      }
      scoped("vs_encode_only") { track =>
        IvfPq.encodeWith(
          track(batch.select(col("vec_id"), col("v"))),
          hist.coarse, hist.codebooks, Pq.NumSubs, track)
      }
      val outDir = graft.ops.Export.scratch("graft_prof_vecout")
      timeU("vs_process_batch") {
        graft.stream.IngestVecDedup.processBatch(batch, 1L, hist,
          s"$outDir/manifest", s"$outDir/codes", 2, 0.8)
      }
    }
    spark.stop()
  }
}
