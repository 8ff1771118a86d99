package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The FROZEN-history seam of EMBEDDING near-dup dedup —
  * [[DedupHistory]]'s artifact split applied to the vector modality
  * (Johnson et al. 2017's IVF layout serving dedup instead of search).
  *
  * [[Dedup.dedupEmbIncremental]] is the self-contained form: one plan
  * that trains the coarse quantizer on the history split, buckets the
  * history vectors by cell AND probes the batch — what a
  * DuckDB-replayable gate needs. Production freezes the history side:
  * the trained codebook and the per-cell vector lists are computed once
  * at snapshot time and then PROBED by every subsequent batch. This
  * object is that split: [[write]]/[[read]] persist and load the three
  * artifacts, [[probe]] runs the cell-restricted cosine verify for a
  * new batch against them, and [[graft.stream.IngestVecDedup]] turns
  * the probe into a foreachBatch micro-pipeline — the streaming rung
  * that completes the modality ladder (text streams via
  * [[graft.stream.IngestNearDedup]]; vectors stream here).
  *
  * The probe kernel ([[manifestAgainst]]) is SHARED with the
  * self-contained gate — `dedup_emb_incremental`, the persisted-probe
  * gate `dedup_emb_probe` and the streaming sink all execute the same
  * spelling, so the three can never drift (they also share one oracle
  * SQL string, the [[DedupHistory.dedupIncrementalProbe]] precedent).
  *
  * 100 TB shape, per increment: batch vectors rank the coarse codebook
  * (a broadcast literal — O(k) per row) and carry their top-`probeCells`
  * cells into the verify as the pinned BUILD side, so the history
  * vector lists are only ever PROBED — streamed through a
  * broadcast/shuffle-hash join build from the batch side, never
  * re-partitioned — and on the persisted cell-partitioned layout a
  * batch that probes p cells reads p directories and skips the rest
  * (the [[IvfPq.writeIndex]] file-pruning dividend, here for dedup).
  * Recall is the ANN contract: a true near-dup outside the probed
  * cells is missed — widen `probeCells` to trade cost for recall; the
  * verify is exact cosine, so every REPORTED dup is real. The third
  * artifact (PQ codebooks) exists for the growth path: kept batch
  * vectors are [[IvfPq.encode]]d under the frozen codebooks and
  * APPENDED into the standing inverted-list layout ([[IvfPq
  * .compactCodes]] absorbs the resulting file fragmentation), so the
  * searchable index and the dedup history advance together without
  * retraining.
  */
object EmbHistory {

  /** The three persisted artifacts. `coarse` = (cell, cv) — the
    * history-trained quantizer; `vectors` = (vec_id, v, nrm, ivf_cell)
    * — the per-cell history lists, the verify's probe side;
    * `codebooks` = (sub, cell, cv) — PQ codebooks for encoding kept
    * batch vectors into the standing index. */
  case class Artifacts(coarse: DataFrame, vectors: DataFrame,
                       codebooks: DataFrame)

  /** History-side construction shared with the self-contained gate:
    * rank-stable k-seed pick (parallel TakeOrderedAndProject — no
    * Window over the corpus), Lloyd rounds, cell assignment. `hist`
    * is (vec_id, v, nrm); returns (coarse codebook, per-cell vector
    * lists). Seed/round rules are EXACTLY [[Dedup.dedupEmbIncremental]]'s
    * (same oracle replays both). */
  private[ext] def dedupSide(hist: DataFrame, k: Int,
                             rounds: Int): (DataFrame, DataFrame) = {
    val seeds = hist.orderBy(col("vec_id")).limit(k)
      .agg(array_sort(collect_list(struct(col("vec_id"), col("v")))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("cell", "s")))
      .select(col("cell").cast(LongType), col("s.v").as("cv"))
    val coarse = KMeans.trainedCodebookFrom(
      hist.select(col("vec_id"), col("v")), seeds, rounds)
    val vectors = hist.join(
      KMeans.assignCells(hist.select(col("vec_id"), col("v")), coarse)
        .withColumnRenamed("cell", "ivf_cell"),
      "vec_id")
    (coarse, vectors)
  }

  /** (vec_id, v) → (vec_id, v, nrm) — the norm rides the frame so the
    * cosine verify never recomputes it per candidate pair. */
  private[graft] def withNorm(vecs: DataFrame): DataFrame =
    vecs.withColumn("nrm",
      sqrt(graft.functions.ArrayDot(col("v"), col("v"))))

  /** Persist the snapshot artifacts for `histVecs` = (vec_id, v) under
    * `dir`. Each artifact derives from the PREVIOUS persisted one —
    * coarse lands first, the cell-partitioned vectors build from the
    * read-back coarse, the PQ codebooks train on the read-back vectors
    * — so the three are mutually consistent by construction
    * ([[DedupHistory.write]]'s rule). */
  def write(histVecs: DataFrame, dir: String,
            k: Int = KMeans.NumCells, rounds: Int = KMeans.NumRounds,
            m: Int = Pq.NumSubs, kSub: Int = Pq.NumCells,
            pqRounds: Int = Pq.NumRounds): Unit = {
    val spark = histVecs.sparkSession
    val hist = withNorm(histVecs)
    val (coarse, _) = dedupSide(hist, k, rounds)
    coarse.write.mode("overwrite").parquet(s"$dir/coarse")
    val coarseR = spark.read.parquet(s"$dir/coarse")
    hist.join(
        KMeans.assignCells(hist.select(col("vec_id"), col("v")), coarseR)
          .withColumnRenamed("cell", "ivf_cell"),
        "vec_id")
      // one contiguous file per inverted list (guide §6 output sizing):
      // without this the join's session-width partitioning fans every
      // cell directory into up to shuffle-partitions tiny files, and the
      // three downstream readers (codebook training, the pinned probe,
      // the streaming ingest) pay listing + footer per file — measured
      // r21: dedup_emb_probe 3.74 → 3.51 s. Rows identical; the
      // ivf_cell= directory scheme (file-level pruning) is unchanged.
      .repartition(col("ivf_cell"))
      .write.mode("overwrite").partitionBy("ivf_cell")
      .parquet(s"$dir/vectors")
    val vecsR = spark.read.parquet(s"$dir/vectors")
    val (codebooks, lastUpdate) =
      Pq.loop(Pq.subVectors(vecsR.select(col("vec_id"), col("v")), m),
              kSub, pqRounds)
    Graph.freeCheckpoint(lastUpdate)
    codebooks.write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  /** Load persisted artifacts. The vectors' partition column comes
    * back type-inferred (INT directories) — re-cast to the written
    * LONG so loaded artifacts are schema-identical to built ones
    * ([[IvfPq.readIndex]]'s rule). */
  def read(spark: SparkSession, dir: String): Artifacts =
    Artifacts(
      spark.read.parquet(s"$dir/coarse"),
      spark.read.parquet(s"$dir/vectors")
        .select(col("vec_id"), col("v"), col("nrm"),
                col("ivf_cell").cast(LongType).as("ivf_cell")),
      spark.read.parquet(s"$dir/codebooks"))

  /** Cache the history frames for a long-lived probe loop (a streaming
    * driver probing hundreds of micro-batches): one eager fill, then
    * every batch reads memory instead of re-scanning the artifact
    * parquet. Session-scoped ([[graft.CacheScope]]). */
  def pinned(a: Artifacts): Artifacts = {
    val c = graft.CacheScope.pin(a.coarse)
    val v = graft.CacheScope.pin(a.vectors)
    val b = graft.CacheScope.pin(a.codebooks)
    c.count(); v.count(); b.count()
    Artifacts(c, v, b)
  }

  /** Probe a new batch (vec_id, v, nrm) against frozen artifacts,
    * emitting [[Dedup.dedupEmbIncremental]]'s manifest shape: one row
    * per batch vector with its verified-duplicate count against
    * history, earliest matching history vector (null when novel), and
    * the keep decision. Pins are session-scoped; run inside
    * `CacheScope.scoped` (or release between queries, as the harnesses
    * do). */
  def probe(batch: DataFrame, hist: Artifacts,
            probeCells: Int = 2, cosineMin: Double = 0.3): DataFrame =
    manifestAgainst(batch, hist.coarse, hist.vectors, probeCells,
      cosineMin, df => graft.CacheScope.pin(df))

  /** The probe kernel, parameterized on the pin strategy: `track` must
    * persist the frame and register it for release under the CALLER's
    * lifecycle — session-scoped for batch queries, per-micro-batch for
    * the streaming sink ([[graft.stream.IngestVecDedup]] unpersists
    * after each batch's write so a soak never accumulates pins).
    * `batch` is (vec_id, v, nrm); `vectors` is the history side
    * (vec_id, v, nrm, ivf_cell). */
  private[graft] def manifestAgainst(batch: DataFrame, coarse: DataFrame,
                                     vectors: DataFrame, probeCells: Int,
                                     cosineMin: Double,
                                     track: DataFrame => DataFrame): DataFrame = {
    // same broadcast-or-shuffle-hash rule as Dedup.pinBuildSide, under
    // the caller's pin lifecycle — both build sides here are O(batch)
    // in the mostly-novel regime but O(batch × probeCells) /
    // O(batch docs) worst-case, so neither broadcast is unconditional
    def buildSide(df: DataFrame): DataFrame = {
      val p = track(df)
      if (p.count() <= Dedup.MaxBroadcastRows) broadcast(p)
      else p.hint("shuffle_hash")
    }
    // per-batch-vector coarse ranking: codebook is a broadcast literal,
    // the window partitions by batch vector — O(batch × k) rows, never
    // a history-side shuffle. The ranked frame is deliberately NARROW
    // (bn, cell, score — [[IvfPq.search]]'s probe spelling): at a
    // properly sized codebook (cells ∝ √history) the crossJoin is
    // batch × hundreds of rows, and dragging the 64-dim vector through
    // that window's exchange multiplies the shuffle by k; the vector
    // rejoins AFTER the top-probeCells cut, when the frame is back to
    // O(batch × probeCells).
    val pw = Window.partitionBy(col("bn")).orderBy(col("score"), col("cell"))
    val ranked =
      batch.crossJoin(broadcast(coarse))
        .select(col("vec_id").as("bn"), col("cell"),
          (graft.functions.ArrayDot(col("cv"), col("cv")) -
           lit(2.0) * graft.functions.ArrayDot(col("v"), col("cv")))
            .as("score"))
        .withColumn("crank", row_number().over(pw))
        .filter(col("crank") <= probeCells)
        .select(col("bn"), col("cell").as("ivf_cell"))
    val probes = buildSide(
      batch.select(col("vec_id").as("bn"), col("v").as("bv"),
          col("nrm").as("bnrm"))
        .join(ranked, "bn")
        .select(col("bn"), col("bv"), col("bnrm"), col("ivf_cell")))
    // THE cell restriction: history lists join the broadcast probe set
    // on ivf_cell — only probed cells' vectors reach the exact cosine
    val ver = vectors.join(probes, "ivf_cell")
      .filter(graft.functions.ArrayDot(col("bv"), col("v")) /
              (col("bnrm") * col("nrm")) >= cosineMin)
      .groupBy(col("bn"))
      .agg(count(lit(1)).as("n_dups"), min(col("vec_id")).as("dup_of"))
    batch.select(col("vec_id"))
      .join(buildSide(ver), col("vec_id") === col("bn"), "left")
      .select(col("vec_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("dup_of"),
        col("bn").isNull.as("kept"))
  }

  /** Gate query: split the corpus on the standing [[Dedup.IncrMod]]
    * fixture, PERSIST the history artifacts to a reaped scratch dir,
    * read them back, and probe the new split — the full artifact
    * round trip (partition-column re-cast included) inside one gate.
    * Value-identical to `dedup_emb_incremental` by construction (same
    * kernel) AND by gate (the same oracle SQL gates both), the
    * [[DedupHistory.dedupIncrementalProbe]] precedent completed with
    * the round trip a streaming driver actually performs. */
  def dedupEmbProbe(spark: SparkSession, dir: String,
                    probeCells: Int = 2, cosineMin: Double = 0.3,
                    k: Int = 8, rounds: Int = 4): DataFrame = {
    val isNew = col("vec_id") % Dedup.IncrMod === 0
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
    val art = graft.ops.Export.scratch("graft_embhist_gate")
    write(vecs.filter(!isNew), art, k, rounds)
    val hist = pinned(read(spark, art))
    graft.Present.sorted(
      probe(graft.CacheScope.pin(withNorm(vecs.filter(isNew))),
            hist, probeCells, cosineMin),
      col("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_emb_probe" -> ((s, d) => dedupEmbProbe(s, d)))

  /** Same oracle as `dedup_emb_incremental` — the artifact split is an
    * execution-strategy change, not a semantic one, and sharing the
    * SQL pins exactly that. */
  val oracles: Map[String, String] = Map(
    "dedup_emb_probe" -> Dedup.oracles("dedup_emb_incremental"))
}
