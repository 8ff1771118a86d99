package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming endurance soak — the evidence STREAMBENCH's 75 s legs cannot
  * give: that the STATEFUL legs' watermark eviction actually bounds the
  * state store over time, and batch latency at minute 10 matches minute 1.
  *
  * STREAMBENCH measures steady-state THROUGHPUT on identical micro-batches;
  * a state leak (eviction not keeping up, session merge leaving orphans)
  * would not surface in 75 s but compounds over minutes and eventually
  * degrades every batch. This main runs the two state-heaviest legs —
  * session windows (merge-heavy session_window state) and the
  * stream-stream interval join (symmetric hash state, watermark + range
  * eviction) — for `SPARK_GRAFT_SOAK_SECS` (default 600 s) each and
  * compares the FIRST minute of steady batches against the LAST minute:
  *
  *  - `batch_ms_p50` / `batch_ms_p95` first vs last (degradation ratio),
  *  - state rows + state memory first vs last (growth ratio): bounded
  *    state plateaus at the key space, so the last/first ratio must be
  *    ~1, not climbing with wall-clock.
  *
  * Batches are collected with a [[StreamingQueryListener]], NOT
  * `recentProgress` — the progress ring buffer retains only the last
  * ~100 updates and a 10-minute leg produces several hundred.
  *
  * Output: one JSON line to stdout and STREAMSOAK.json (same loss-proof
  * artifact policy as Bench/StreamBench). A leg whose query died, whose
  * p50 degraded beyond [[StreamSoak.DegradeBound]], or whose state rows
  * kept growing fails the run (non-zero exit) — this is an assertion,
  * not just a report.
  */
object StreamSoak {

  /** last-minute p50 may exceed first-minute p50 by at most this factor
    * (20% — the bound the round-13 review asked to be demonstrated). */
  private val DegradeBound = 1.2

  /** state rows at the end may exceed the first-minute plateau by at most
    * this factor: watermark eviction lags input by the watermark horizon,
    * so a small overshoot is legitimate; unbounded growth is not. */
  private val StateGrowthBound = 1.5

  private case class Obs(wallMs: Long, durMs: Double, rows: Long,
                         rps: Double, stateRows: Long, stateMemBytes: Long)

  private final class Collector(runId: java.util.UUID)
      extends StreamingQueryListener {
    val obs = ArrayBuffer.empty[Obs]
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryIdle(e: QueryIdleEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      if (e.progress.runId == runId && e.progress.numInputRows > 0)
        obs.synchronized {
          obs += Obs(
            System.currentTimeMillis(),
            e.progress.durationMs.getOrDefault("triggerExecution", 0L).toDouble,
            e.progress.numInputRows,
            e.progress.processedRowsPerSecond,
            e.progress.stateOperators.map(_.numRowsTotal).sum,
            e.progress.stateOperators.map(_.memoryUsedBytes).sum)
        }
  }

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s(math.min(s.size - 1, math.max(0, (p * (s.size - 1)).round.toInt)))
  }

  private def windowStats(w: Seq[Obs]): Map[String, Double] =
    if (w.isEmpty) Map("batches" -> 0.0)
    else Map(
      "batches"      -> w.size.toDouble,
      "batch_ms_p50" -> pct(w.map(_.durMs), 0.5),
      "batch_ms_p95" -> pct(w.map(_.durMs), 0.95),
      "rows_per_sec_p50" -> pct(w.map(_.rps), 0.5),
      "state_rows"   -> w.last.stateRows.toDouble,
      "state_mem_mb" -> w.last.stateMemBytes / 1e6)

  /** Soak one leg: run `df` as a noop-sink streaming query for `secs`,
    * return (stats, ok). First 2 data batches are warmup (JIT + state
    * ramp), excluded from the first-minute window. */
  private def soakLeg(spark: SparkSession, name: String, df: DataFrame,
                      ckpt: String, secs: Int): (String, Boolean) =
    soakWriter(spark, name,
      df.writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", s"$ckpt/$name"),
      secs)

  /** Writer-level form of [[soakLeg]] — the curation leg soaks its
    * foreachBatch micro-pipeline (a real parquet-appending sink), not
    * a noop wrapper, so the measured path IS the production path. */
  private def soakWriter(spark: SparkSession, name: String,
                         writer: org.apache.spark.sql.streaming.DataStreamWriter[
                           org.apache.spark.sql.Row],
                         secs: Int): (String, Boolean) = {
    val q = writer.start()
    val collector = new Collector(q.runId)
    spark.streams.addListener(collector)
    Thread.sleep(secs * 1000L)
    val died = q.exception
    // awaitTermination rethrows the query's failure if it died mid-soak;
    // that must not abort the soak — the death is already captured in
    // `died` and reported as the leg's ok:false entry below.
    q.stop()
    try q.awaitTermination()
    catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    spark.streams.removeListener(collector)
    died.foreach(e => System.err.println(s"[soak] $name query failed: $e"))
    val all = collector.obs.synchronized(collector.obs.toVector)
    val steady = all.drop(2)
    if (steady.isEmpty || died.isDefined)
      return (s""""$name":{"batches":0,"ok":false}""", false)
    val t0 = steady.head.wallMs
    val tEnd = steady.last.wallMs
    val first = steady.filter(_.wallMs < t0 + 60000L)
    val last  = steady.filter(_.wallMs >= tEnd - 60000L)
    val f = windowStats(first)
    val l = windowStats(last)
    val degrade = l("batch_ms_p50") / math.max(1e-9, f("batch_ms_p50"))
    val stateGrowth = l("state_rows") / math.max(1.0, f("state_rows"))
    val ok = degrade <= DegradeBound && stateGrowth <= StateGrowthBound
    def jm(m: Map[String, Double]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
    System.err.println(
      f"[soak] $name: ${steady.size} batches over ${(tEnd - t0) / 1000} s, " +
      f"p50 ${f("batch_ms_p50")}%.0f -> ${l("batch_ms_p50")}%.0f ms " +
      f"(x$degrade%.3f), state ${f("state_rows")}%.0f -> ${l("state_rows")}%.0f " +
      f"rows (x$stateGrowth%.3f) => ${if (ok) "OK" else "DEGRADED"}")
    (s""""$name":{"total_batches":${steady.size},""" +
     s""""soaked_secs":${(tEnd - t0) / 1000},"minute_1":${jm(f)},""" +
     s""""minute_last":${jm(l)},"batch_ms_p50_ratio":$degrade,""" +
     s""""state_rows_ratio":$stateGrowth,"ok":$ok}""", ok)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val secs = sys.env.getOrElse("SPARK_GRAFT_SOAK_SECS", "600").toInt
    val spark = Sessions.local(cpus)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-soak").toString

    // Same wiring as StreamBench's legs 4-5 (identical key spaces and
    // batch sizes), so the soak numbers are directly comparable to the
    // 75 s throughput numbers in STREAMBENCH.json.
    val sessBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_SESSION_BATCH", "1000000").toLong
    val sessions = graft.stream.SessionWindows.userSessions(
      graft.stream.Sources.microBatchRows(spark, sessBatch, 0L)
        .select((col("value") % 200000L).as("user_id"), col("timestamp").as("ts")),
      gap = "5 seconds", watermark = "2 seconds")

    val joinBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_JOIN_BATCH", "100000").toLong
    def leg(rows: Long, idName: String, tsName: String): DataFrame =
      graft.stream.Sources.microBatchRows(spark, rows, 0L)
        .select(concat(lit("I"), (col("value") % 100000).cast(
                  org.apache.spark.sql.types.StringType)).as("instrument"),
                col("value").as(idName), col("timestamp").as(tsName))
    val ijoin = graft.stream.IntervalJoin.quotesNearTrades(
      leg(joinBatch, "trade_id", "trade_ts"),
      leg(joinBatch, "quote_id", "quote_ts"),
      maxLag = "10 seconds", watermark = "5 seconds")

    // Leg 3: the curation foreachBatch micro-pipeline — STATELESS, so
    // the soak's claim here is not state boundedness (state_rows stays
    // 0) but that minute-10 batch latency matches minute-1 while the
    // sink genuinely appends band-partitioned parquet the whole time
    // (file-commit overhead must not compound as the output directory
    // accumulates ~hundreds of batches of files).
    val curBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_CUR_BATCH", "1000000").toLong
    val curOut = java.nio.file.Files.createTempDirectory("graft-soak-cur").toString
    val curation = graft.stream.CurationPipeline.curatedParquetSink(
      graft.stream.Sources.microBatchDocs(spark, curBatch),
      s"$curOut/out", s"$curOut/ckpt")

    def rmTree(root: String): Unit =
      try {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(root)
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case e: Throwable => System.err.println(s"[soak] cleanup $root: $e") }

    val (sessJson, sessOk) = soakLeg(spark, "session_windows", sessions, ckpt, secs)
    val (joinJson, joinOk) = soakLeg(spark, "interval_join", ijoin, ckpt, secs)
    // the curation leg writes ~10 min of band-partitioned parquet plus a
    // checkpoint — real disk, unlike the noop legs — so delete its tree
    // once the stats are collected
    val (curJson, curOk) =
      try soakWriter(spark, "curation", curation, secs)
      finally rmTree(curOut)

    // Leg 4: streaming NEAR-dup ingest — the frozen-artifact foreachBatch
    // probe ([[graft.stream.IngestNearDedup]]). The soak's claim: the
    // per-batch ephemeral pins really do release (hundreds of batches
    // must not accumulate cached RDDs — asserted via the plateau in
    // batch latency), state rows stay 0 (history is artifacts, not
    // state), and minute-10 latency matches minute-1 while the manifest
    // sink genuinely appends parquet the whole time.
    val ndBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_NEARDUP_BATCH", "200000").toLong
    val ndHist  = sys.env.getOrElse("SPARK_GRAFT_STREAM_NEARDUP_HIST", "100000").toLong
    val ndDir = java.nio.file.Files.createTempDirectory("graft-soak-nd").toString
    graft.ext.DedupHistory.write(
      graft.stream.Sources.nearDupDocs(spark.range(ndHist).toDF(), col("id"), 0L),
      s"$ndDir/art")
    val ndArt = graft.ext.DedupHistory.pinned(
      graft.ext.DedupHistory.read(spark, s"$ndDir/art"))
    val ndSink = graft.stream.IngestNearDedup.manifestSink(
      graft.stream.Sources.nearDupDocs(
        graft.stream.Sources.microBatchRows(spark, ndBatch, 0L),
        col("value"), 1000000000000L),
      ndArt, s"$ndDir/manifest", s"$ndDir/ckpt")
    val (ndJson, ndOk) =
      try soakWriter(spark, "near_dedup", ndSink, secs)
      finally rmTree(ndDir)

    // Leg 5: streaming VECTOR ingest — the frozen-artifact foreachBatch
    // probe for the embedding modality ([[graft.stream.IngestVecDedup]]),
    // which appends TWO outputs per batch (manifest + kept vectors'
    // IVF-PQ codes). Same soak claims as leg 4 — zero state rows,
    // per-batch pins released, flat latency — plus one this leg alone
    // can make: the cell-partitioned codes append stays healthy over
    // hundreds of small per-batch files (the fragmentation
    // compactCodes exists to absorb).
    val vdBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_VECDEDUP_BATCH", "10000").toLong
    val vdHist  = sys.env.getOrElse("SPARK_GRAFT_STREAM_VECDEDUP_HIST", "100000").toLong
    // cells ∝ √history — StreamBench's r21 sizing rationale (the k=8
    // default over 100k history made each batch verify ~250M pairs)
    val vdCells = sys.env.getOrElse("SPARK_GRAFT_STREAM_VECDEDUP_CELLS",
      math.max(8L, math.round(math.sqrt(vdHist.toDouble))).toString).toInt
    val vdDir = java.nio.file.Files.createTempDirectory("graft-soak-vd").toString
    graft.ext.EmbHistory.write(
      graft.stream.Sources.nearDupVecs(spark.range(vdHist).toDF(), col("id"), 0L),
      s"$vdDir/art", k = vdCells)
    val vdArt = graft.ext.EmbHistory.pinned(
      graft.ext.EmbHistory.read(spark, s"$vdDir/art"))
    val vdSink = graft.stream.IngestVecDedup.manifestSink(
      graft.stream.Sources.nearDupVecs(
        graft.stream.Sources.microBatchRows(spark, vdBatch, 0L),
        col("value"), 1000000000000L),
      vdArt, s"$vdDir/manifest", s"$vdDir/index/codes", s"$vdDir/ckpt",
      probeCells = 2, cosineMin = 0.8)
    val (vdJson, vdOk) =
      try soakWriter(spark, "vec_dedup", vdSink, secs)
      finally { rmTree(vdDir); rmTree(ckpt) }

    val json =
      s"""{"metric":"stream_soak","unit":"ms","secs_per_leg":$secs,""" +
      s""""degrade_bound":$DegradeBound,"state_growth_bound":$StateGrowthBound,""" +
      s"""$sessJson,$joinJson,$curJson,$ndJson,$vdJson}"""
    println(json)
    try java.nio.file.Files.write(java.nio.file.Paths.get("STREAMSOAK.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[soak] write: $e") }
    spark.stop()
    if (!(sessOk && joinOk && curOk && ndOk && vdOk)) sys.exit(1)
  }
}
