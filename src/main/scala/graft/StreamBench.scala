package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.schema.Candle
import graft.stream.{CandlePipeline, IngestDedup, RollingTail, SessionWindows, Sources}

/** Streaming throughput micro-bench — the engine-side number next to
  * BASELINE.md's operational row (the reference sustains ~50 msg/s with
  * 1–2 s micro-batches, /root/reference/README.md:544-547).
  *
  * Method: drive each stateful pipeline from the `rate-micro-batch`
  * source — every micro-batch carries exactly `rowsPerBatch` rows and
  * the next trigger fires as soon as the previous commits, so per-batch
  * `processedRowsPerSecond` measures pipeline CAPACITY on identical,
  * comparable batches. (The plain `rate` source was tried first: under
  * backlog its batch sizes balloon run-over-run — 3× swings on unchanged
  * code — because each batch swallows whatever accumulated.) The sink is
  * `noop` — every output row is fully materialized, no sink I/O in the
  * measurement. Pipelines run SEQUENTIALLY (concurrent queries would
  * share the 32 cores and undercount both).
  *
  * Reported per pipeline, over steady-state batches (first
  * [[StreamBench.WarmupBatches]] skipped): median + max processed
  * rows/s, median + p95 micro-batch duration, batch count. One JSON line
  * to stdout AND to STREAMBENCH.json (stdout tails get truncated — the
  * file is the loss-proof artifact, same policy as Bench).
  */
object StreamBench {

  // 2, not more: with fixed-size batches the post-JIT steady state
  // arrives by the third batch, and the slowest leg (candle pipeline,
  // ~8 s/batch) must still leave a usable steady sample inside the run.
  private val WarmupBatches = 2

  private def percentile(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s(math.min(s.size - 1, math.max(0, (p * (s.size - 1)).round.toInt)))
  }

  /** Run `query` for `secs` seconds, then report steady-state stats.
    * A leg whose query DIED mid-run must not masquerade as a valid
    * measurement: its stats carry a `failed` marker and the process
    * exits non-zero (checked in main). The leg's wall-clock is bracketed
    * with [[HostCal.stealTicks]] (r16 verdict item 4: STREAMBENCH p50s
    * swung ±25% with host drift, no code change — `steal_frac` makes a
    * noisy leg visibly noisy, same contract as Bench's per-rep field). */
  private def measure(q: StreamingQuery, secs: Int): Map[String, Double] = {
    val s0 = HostCal.stealTicks()
    val t0 = System.nanoTime()
    Thread.sleep(secs * 1000L)
    // read the steal bracket BEFORE stop(): the stop drain can block
    // for seconds on an in-flight batch that contributes nothing to the
    // published stats — a burst during the drain must not taint a leg
    // whose measured batches all ran clean. (Warmup batches remain
    // inside the bracket — conservative, and they're a fixed small
    // fraction of the window.)
    val steal = HostCal.stealFrac(s0, HostCal.stealTicks(),
                                  (System.nanoTime() - t0) / 1e9)
    val all = q.recentProgress.toSeq
    val died = q.exception
    q.stop()
    died.foreach(e => System.err.println(s"[streambench] query failed: $e"))
    val failMark: Map[String, Double] =
      if (died.isDefined) Map("failed" -> 1.0) else Map.empty
    val steady = all.filter(_.numInputRows > 0).drop(WarmupBatches)
    val batches = if (steady.nonEmpty) steady else all.filter(_.numInputRows > 0)
    if (batches.isEmpty)
      return failMark ++ Map("batches" -> 0.0, "steal_frac" -> steal)
    val rps  = batches.map(_.processedRowsPerSecond)
    val durs = batches.map(_.durationMs.get("triggerExecution").toDouble)
    failMark ++ Map(
      "rows_per_sec_p50" -> percentile(rps, 0.5),
      "rows_per_sec_max" -> rps.max,
      "batch_ms_p50"     -> percentile(durs, 0.5),
      "batch_ms_p95"     -> percentile(durs, 0.95),
      "batches"          -> batches.size.toDouble,
      "steal_frac"       -> steal)
  }

  // fixed-size micro-batch base stream — shared loader in Sources so the
  // batch-shape/event-time-advance semantics live in ONE place
  private def microBatchRows(spark: SparkSession, rowsPerBatch: Long): DataFrame =
    graft.stream.Sources.microBatchRows(spark, rowsPerBatch)

  /** Synthetic candle stream for the RollingTail leg: 1000 instruments,
    * deterministic values — the state-store fan-out a real candle topic
    * produces, without coupling the two measurements. */
  private def synthCandles(spark: SparkSession, rowsPerBatch: Long): Dataset[Candle] = {
    import spark.implicits._
    microBatchRows(spark, rowsPerBatch)
      .select(
        concat(lit("I"), (col("value") % 1000).cast(StringType)).as("instrument"),
        col("timestamp").cast(TimestampNTZType).as("window_start"),
        (col("timestamp") + expr("INTERVAL 1 MINUTE")).cast(TimestampNTZType)
          .as("window_end"),
        (col("value") % 997).cast(DoubleType).as("open"),
        (col("value") % 997 + 1).cast(DoubleType).as("high"),
        (col("value") % 997 - 1).cast(DoubleType).as("low"),
        (col("value") % 991).cast(DoubleType).as("close"),
        lit(1).as("buy_volume"), lit(1).as("sell_volume"),
        lit(2).as("total_volume"), lit(0).as("delta"),
        (col("value") % 13).cast(DoubleType).as("tbq"),
        (col("value") % 17).cast(DoubleType).as("tsq"))
      .as[Candle]
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val secs = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "75").toInt
    val tickBatch   = sys.env.getOrElse("SPARK_GRAFT_STREAM_TICK_BATCH", "2000000").toLong
    val candleBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_CANDLE_BATCH", "4000000").toLong
    val docBatch    = sys.env.getOrElse("SPARK_GRAFT_STREAM_DOC_BATCH", "4000000").toLong
    val spark = Sessions.local(cpus)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-streambench").toString
    // Same cross-round denominator as Bench: compare leg_p50 × cal_par,
    // not raw rows/s, when two rounds' artifacts disagree uniformly.
    val calSingle = HostCal.calSingle()
    val calPar = HostCal.calPar()
    System.err.println(
      "[streambench] host calibration: single %.3f s, parallel %.3f s".formatLocal(
        java.util.Locale.ROOT, calSingle, calPar))

    // Leg 1: the reference's core pipeline — wire JSON → parse → classify
    // → watermark → windowed candles (append).
    val candleQ = CandlePipeline
      .candles(Sources.microBatchTicks(spark, tickBatch))
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$ckpt/candles").start()
    val candleStats = measure(candleQ, secs)

    // Leg 2: the dashboard's rolling tail as engine-side bounded state
    // (update) — 1000 instruments through flatMapGroupsWithState.
    val tailQ = RollingTail.stats(synthCandles(spark, candleBatch))
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", s"$ckpt/tail").start()
    val tailStats = measure(tailQ, secs)

    // Leg 3: in-flight exact dedup — watermark-bounded
    // dropDuplicatesWithinWatermark state over synthetic docs (each run
    // of 10 consecutive values shares one body, so ~90% of rows are
    // in-horizon duplicates the state must catch).
    val docs = microBatchRows(spark, docBatch)
      .select(col("timestamp").as("ts"),
        concat(lit("doc body "), (col("value") - col("value") % 10).cast(StringType))
          .as("text"))
    val dedupQ = IngestDedup.exactWithinWatermark(docs, "ts", "10 seconds")
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$ckpt/dedup").start()
    val dedupStats = measure(dedupQ, secs)

    // Leg 4: stream-stream interval join — symmetric hash state bounded
    // by watermark + range. 100k instruments so per-key match fan-out
    // stays ~1 quote/key/batch; each trade matches ≈ lag-window batches.
    val joinBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_JOIN_BATCH", "100000").toLong
    def leg(rows: Long, idName: String, tsName: String): DataFrame =
      graft.stream.Sources.microBatchRows(spark, rows, 0L)
        .select(concat(lit("I"), (col("value") % 100000).cast(StringType))
                  .as("instrument"),
                col("value").as(idName), col("timestamp").as(tsName))
    val joinQ = graft.stream.IntervalJoin.quotesNearTrades(
        leg(joinBatch, "trade_id", "trade_ts"),
        leg(joinBatch, "quote_id", "quote_ts"),
        maxLag = "10 seconds", watermark = "5 seconds")
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$ckpt/ijoin").start()
    val joinStats = measure(joinQ, secs)

    // Leg 5: streaming sessionization — session_window state maintenance
    // under the MERGE-heavy regime: 200k users, every batch extends every
    // user's open session (state bounded by the key space, the window
    // store's merge path exercised on every row). Emission-on-close
    // semantics are pinned in SessionWindowsSpec; this leg measures the
    // state-update throughput that dominates a production sessionizer.
    val sessBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_SESSION_BATCH", "1000000").toLong
    val sessQ = SessionWindows.userSessions(
        graft.stream.Sources.microBatchRows(spark, sessBatch, 0L)
          .select((col("value") % 200000L).as("user_id"),
                  col("timestamp").as("ts")),
        gap = "5 seconds", watermark = "2 seconds")
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$ckpt/sessions").start()
    val sessStats = measure(sessQ, secs)

    // Leg 6: streaming curation — the LLM-pipeline leg: Gopher rules +
    // classifier banding as a stateless per-row gate ("clean the crawl
    // as it lands"). Half the docs carry a 64-word passing body, half a
    // failing stub, so both branches of the quality gate run every
    // batch. Smaller batch than the scalar legs: each row tokenizes a
    // ~65-word text through the Gopher HOFs, the same per-row cost the
    // batch gopher_rules gate pays.
    val curBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_CUR_BATCH", "1000000").toLong
    val curQ = graft.stream.CurationPipeline
      .curated(Sources.microBatchDocs(spark, curBatch))
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$ckpt/curation").start()
    val curStats = measure(curQ, secs)

    // Leg 7: streaming NEAR-dup ingest — each micro-batch probed against
    // FROZEN history artifacts (bloom + band table + shingles) through
    // the foreachBatch manifest sink, the real parquet-appending path.
    // History is built once before the clock starts and pinned, so the
    // measured cost is the production per-batch shape: batch-side
    // shingle/md5 work, the bloom gate (95% of docs end there — the
    // mostly-novel crawl regime), and the candidate joins for the
    // planted 5% near-dups.
    val ndBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_NEARDUP_BATCH", "200000").toLong
    val ndHist  = sys.env.getOrElse("SPARK_GRAFT_STREAM_NEARDUP_HIST", "100000").toLong
    val ndDir = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    graft.ext.DedupHistory.write(
      Sources.nearDupDocs(spark.range(ndHist).toDF(), col("id"), 0L),
      s"$ndDir/art")
    val ndArt = graft.ext.DedupHistory.pinned(
      graft.ext.DedupHistory.read(spark, s"$ndDir/art"))
    val ndQ = graft.stream.IngestNearDedup.manifestSink(
        Sources.nearDupDocs(
          graft.stream.Sources.microBatchRows(spark, ndBatch),
          col("value"), 1000000000000L),
        ndArt, s"$ndDir/manifest", s"$ckpt/neardup").start()
    val ndStats = measure(ndQ, secs)
    // the append legs write ~secs worth of real parquet — delete their
    // trees once the stats are collected
    def rmTree(dir: String): Unit =
      try {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case e: Throwable => System.err.println(s"[streambench] cleanup: $e") }
    rmTree(ndDir)

    // Leg 8: streaming VECTOR ingest — micro-batches probed against the
    // FROZEN embedding-dedup artifacts (history-trained coarse codebook
    // + per-cell vector lists) through the foreachBatch sink that
    // appends BOTH the near-dup manifest and the kept vectors' IVF-PQ
    // codes — the real double-append path. History is built once before
    // the clock starts and pinned; the measured per-batch shape is the
    // coarse ranking (8 dots/row against a broadcast literal), the
    // probed cells' exact-cosine verify (only the planted 5% cross the
    // 0.8 bar — the mostly-novel crawl regime), the PQ encode of the
    // kept ~95%, and the two parquet appends.
    // 10k default (r20 ADVICE): at 50k a batch ran ~40 s, so a 75 s leg
    // measured 2 batches and published warmup-dominated "percentiles"
    // (p50 == p95 == max). At 10k the leg collects enough batches for
    // p50/p95 to be real order statistics while each batch still
    // exercises the full probe+verify+encode+write shape.
    val vdBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_VECDEDUP_BATCH", "10000").toLong
    val vdHist  = sys.env.getOrElse("SPARK_GRAFT_STREAM_VECDEDUP_HIST", "100000").toLong
    // Codebook sized cells ∝ √history, the engine's own sizing rule
    // (EmbHistory/IvfPq docs): r21 decomposition showed the verify
    // stage's pair count is |cell vectors| × |cell probes| per probed
    // cell, so the gate-sized k=8 default over a 100k history made one
    // 10k-row batch compute ~250M cosine pairs (~19 s/batch — the whole
    // leg was 2 warmup-dominated batches). At √100k ≈ 316 cells the
    // same batch verifies ~6M pairs. Build cost is pre-clock.
    val vdCells = sys.env.getOrElse("SPARK_GRAFT_STREAM_VECDEDUP_CELLS",
      math.max(8L, math.round(math.sqrt(vdHist.toDouble))).toString).toInt
    val vdDir = java.nio.file.Files.createTempDirectory("graft-vecdedup").toString
    graft.ext.EmbHistory.write(
      Sources.nearDupVecs(spark.range(vdHist).toDF(), col("id"), 0L),
      s"$vdDir/art", k = vdCells)
    val vdArt = graft.ext.EmbHistory.pinned(
      graft.ext.EmbHistory.read(spark, s"$vdDir/art"))
    val vdQ = graft.stream.IngestVecDedup.manifestSink(
        Sources.nearDupVecs(
          graft.stream.Sources.microBatchRows(spark, vdBatch),
          col("value"), 1000000000000L),
        vdArt, s"$vdDir/manifest", s"$vdDir/index/codes", s"$ckpt/vecdedup",
        probeCells = 2, cosineMin = 0.8)
      .start()
    val vdStats = measure(vdQ, secs)
    rmTree(vdDir)

    def jm(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
    def fc(d: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    val json =
      s"""{"metric":"stream_throughput","unit":"rows/sec","secs_per_leg":$secs,""" +
      s""""cal_single_sec":${fc(calSingle)},"cal_par_sec":${fc(calPar)},""" +
      s""""rows_per_batch":{"candle_pipeline":$tickBatch,"rolling_tail":$candleBatch,"ingest_dedup":$docBatch,"interval_join":${2 * joinBatch},"session_windows":$sessBatch,"curation":$curBatch,"near_dedup":$ndBatch,"vec_dedup":$vdBatch},""" +
      s""""candle_pipeline":${jm(candleStats)},"rolling_tail":${jm(tailStats)},""" +
      s""""ingest_dedup":${jm(dedupStats)},"interval_join":${jm(joinStats)},""" +
      s""""session_windows":${jm(sessStats)},"curation":${jm(curStats)},""" +
      s""""near_dedup":${jm(ndStats)},"vec_dedup":${jm(vdStats)},""" +
      s""""baseline_reference":{"msgs_per_sec":50,"micro_batch_sec":"1-2"}}"""
    println(json)
    try java.nio.file.Files.write(java.nio.file.Paths.get("STREAMBENCH.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[streambench] write: $e") }
    spark.stop()
    // a crashed leg's numbers are not a measurement — fail the run loudly
    if (Seq(candleStats, tailStats, dedupStats, joinStats, sessStats, curStats,
            ndStats, vdStats)
          .exists(_.contains("failed")))
      sys.exit(1)
  }
}
