package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** The composed IVF-PQ index (Jégou et al. 2011, IVFADC §V) — the
  * production ANN shape the [[KMeans]]/[[Pq]] trainers exist to feed:
  * a TRAINED coarse quantizer routes every vector to one inverted
  * list, PQ codes compress it inside that list, and a query probes
  * only its top-`probeCells` closest lists, ADC-scanning a
  * `probeCells / K` fraction of the corpus instead of all of it
  * (`knn_pq`'s honest full-scan caveat, closed).
  *
  * This module is the TRAIN-ONCE / PERSIST / PROBE-FOREVER seam the
  * [[LangModel]] external-model path established for scoring: the
  * three artifacts — coarse codebook (K rows), PQ codebooks (M·K'
  * rows), corpus codes (vec_id, ivf_cell, sub, code) — round-trip
  * through parquet ([[writeIndex]]/[[readIndex]]), and IvfPqSpec pins
  * that re-encoding under the LOADED codebooks is bit-identical to
  * the in-training assignment (pure integer/parquet-exact-double
  * artifacts, no re-train drift).
  *
  * 100 TB posture: [[writeIndex]] lays the codes out PARTITIONED BY
  * `ivf_cell`, so a probe's cell restriction prunes at the FILE level
  * — the scan never opens unprobed cells' files (IvfPqSpec pins
  * PartitionFilters on the loaded read). In-plan, the probe set
  * (queries × probeCells rows) and the per-query distance tables
  * (M·K' rows/query) both broadcast, so the corpus codes never
  * shuffle; the only exchange is the O(survivors) ADC aggregate,
  * collapsed map-side. Every determinism decision is inherited:
  * argmin min-structs with cell-id tiebreaks, ppm-quantized lookup
  * tables, exact LONG ADC sums ([[Pq.knnPq]]'s rationale).
  */
object IvfPq {

  val NumQueries = 10
  val TopK       = 3
  val ProbeCells = 2

  /** The three persisted artifacts of a trained index. `codes` rows
    * are (vec_id, ivf_cell, sub, code) — the inverted lists, keyed by
    * the coarse cell they live in. */
  final case class Index(coarse: DataFrame, codebooks: DataFrame,
                         codes: DataFrame)

  private def vecsOf(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))

  /** Train both quantizers on `in` = (vec_id, v) and encode the same
    * corpus: ONE coarse Lloyd run + ONE grouped-PQ Lloyd run + one
    * argmin pass each. (A production run trains on a sample and
    * [[encode]]s the full corpus — only the training frame changes.) */
  def trainIndex(in: DataFrame,
                 kCoarse: Int = KMeans.NumCells,
                 coarseRounds: Int = KMeans.NumRounds,
                 m: Int = Pq.NumSubs,
                 kSub: Int = Pq.NumCells,
                 pqRounds: Int = Pq.NumRounds): Index = {
    val vecs = graft.CacheScope.pin(in)
    val coarse = KMeans.trainedCodebook(vecs, kCoarse, coarseRounds)
    val subVecs = graft.CacheScope.pin(Pq.subVectors(vecs, m))
    val (codebooks, lastUpdate) = Pq.loop(subVecs, kSub, pqRounds)
    Graph.freeCheckpoint(lastUpdate)
    val codes = Pq.assignCodes(subVecs, codebooks)
      .join(KMeans.assignCells(vecs, coarse)
              .withColumnRenamed("cell", "ivf_cell"),
            "vec_id")
      .select(col("vec_id"), col("ivf_cell"), col("sub"), col("code"))
    Index(coarse, codebooks, codes)
  }

  /** Persist the three artifacts. Codes go down PARTITIONED BY
    * `ivf_cell` — the inverted-list file layout: a probe restricted
    * to p cells reads p directories and skips the rest entirely. */
  def writeIndex(index: Index, dir: String): Unit = {
    index.coarse.write.mode("overwrite").parquet(s"$dir/coarse")
    index.codebooks.write.mode("overwrite").parquet(s"$dir/codebooks")
    index.codes.write.mode("overwrite").partitionBy("ivf_cell")
      .parquet(s"$dir/codes")
  }

  /** Load a persisted index. The partition column comes back
    * type-inferred (INT directories) — re-cast to the written LONG so
    * loaded artifacts are schema-identical to trained ones. */
  def readIndex(spark: SparkSession, dir: String): Index =
    Index(
      spark.read.parquet(s"$dir/coarse"),
      spark.read.parquet(s"$dir/codebooks"),
      spark.read.parquet(s"$dir/codes")
        .select(col("vec_id"), col("ivf_cell").cast(LongType).as("ivf_cell"),
                col("sub"), col("code")))

  /** Encode NEW vectors (vec_id, v) under the trained codebooks — the
    * incremental-ingest path: no training, two broadcast argmin
    * passes, output appends straight into the partitioned layout. */
  def encode(in: DataFrame, coarse: DataFrame,
             codebooks: DataFrame, m: Int = Pq.NumSubs): DataFrame =
    encodeWith(in, coarse, codebooks, m, df => graft.CacheScope.pin(df))

  /** [[encode]] parameterized on the pin strategy — `in` feeds both
    * argmin passes, so the caller chooses the persist lifecycle:
    * session-scoped for batch ingest, per-micro-batch for the
    * streaming sink ([[graft.stream.IngestVecDedup]] unpersists after
    * each batch's append so a soak never accumulates pins). */
  private[graft] def encodeWith(in: DataFrame, coarse: DataFrame,
                                codebooks: DataFrame, m: Int,
                                track: DataFrame => DataFrame): DataFrame = {
    val vecs = track(in)
    Pq.assignCodes(Pq.subVectors(vecs, m), codebooks)
      .join(KMeans.assignCells(vecs, coarse)
              .withColumnRenamed("cell", "ivf_cell"),
            "vec_id")
      .select(col("vec_id"), col("ivf_cell"), col("sub"), col("code"))
  }

  /** Cell-restricted ADC top-k: rank coarse cells per query, keep the
    * top `probeCells`, and scan ONLY those cells' codes. `queries` is
    * (query_id, v); output is (query_id, rank, nn_id, adc_ppm) —
    * [[Pq.knnPq]]'s exact output contract, so the two are directly
    * comparable (IvfPqSpec measures both recalls side by side). */
  def search(queries: DataFrame, index: Index,
             probeCells: Int = ProbeCells, topK: Int = TopK,
             m: Int = Pq.NumSubs): DataFrame = {
    val q = graft.CacheScope.pin(queries)
    // top-probeCells coarse cells per query — the probe set: O(queries
    // × probeCells) rows, broadcast. Rank score is the same |c|²−2·q·c
    // argmin form the assignment uses, so a corpus query's rank-1 cell
    // IS its own cell (single-probe ⊂ multi-probe by construction).
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("score"), col("cell"))
    val probes = q.crossJoin(broadcast(index.coarse))
      .select(col("query_id"), col("cell"),
        (graft.functions.ArrayDot(col("cv"), col("cv")) -
         lit(2.0) * graft.functions.ArrayDot(col("v"), col("cv")))
          .as("score"))
      .withColumn("crank", row_number().over(pw))
      .filter(col("crank") <= probeCells)
      .select(col("query_id"), col("cell").as("ivf_cell"))
    // per-(query, subspace, codeword) ADC lookup tables, ppm-quantized
    // at the table so the per-vector sum is exact LONG arithmetic
    val qd = Pq.subVectors(q.select(col("query_id").as("vec_id"), col("v")), m)
      .select(col("vec_id").as("query_id"), col("sub"), col("sv"))
      .join(broadcast(index.codebooks), "sub")
      .select(col("query_id"), col("sub"), col("cell").as("code"),
        floor((graft.functions.ArrayDot(col("sv"), col("sv")) +
               graft.functions.ArrayDot(col("cv"), col("cv")) -
               lit(2.0) * graft.functions.ArrayDot(col("sv"), col("cv")))
              * lit(1000000L)).cast(LongType).as("d2_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_ppm"), col("nn_id"))
    // THE cell restriction: codes ⋈ broadcast probe set on ivf_cell —
    // only probed cells' rows survive into the ADC join, and on the
    // partitioned layout the restriction prunes whole files
    index.codes.join(broadcast(probes), "ivf_cell")
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(qd), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id").as("nn_id"))
      .agg(sum(col("d2_ppm")).as("adc_ppm"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("nn_id"), col("adc_ppm"))
  }

  /** Gate query: train both quantizers, encode, probe, ADC — all in
    * one plan so the DuckDB oracle can replay it exactly. The
    * persisted-artifact round trip is IvfPqSpec's job (a gate query
    * can't carry cross-run state); the plan here is IDENTICAL to the
    * loaded-artifact probe because search() takes the artifacts as
    * plain frames either way. */
  def knnIvfPq(spark: SparkSession, dir: String,
               numQueries: Int = NumQueries, probeCells: Int = ProbeCells,
               topK: Int = TopK): DataFrame = {
    val index = trainIndex(vecsOf(spark, dir))
    graft.Present.sorted(
      search(
        vecsOf(spark, dir).filter(col("vec_id") < numQueries)
          .select(col("vec_id").as("query_id"), col("v")),
        index, probeCells, topK),
      col("query_id"), col("rank"))
  }

  // ==== the RESIDUAL-encoded variant: IVFADC proper (Jégou et al.
  // 2011 §V.B) ====
  //
  // [[trainIndex]] PQ-encodes RAW vectors — simple, and correct as far
  // as it goes — but the published index encodes each vector's
  // RESIDUAL r = v − centroid(cell(v)): residuals concentrate near the
  // origin, so the same M·log₂K bits quantize a much tighter
  // distribution and recall rises at identical storage. The cost is
  // query-side: distance tables become per-(query, PROBED CELL) — the
  // query's residual differs per cell — i.e. probeCells × M × K table
  // rows per query instead of M × K. Still O(queries) broadcast rows,
  // never corpus-scale.

  /** Train the residual index: coarse quantizer as before, PQ trained
    * on ASSIGNMENT RESIDUALS. Same artifact shape as [[trainIndex]]
    * (the two are drop-in interchangeable on disk — only the search
    * must match the encoding). */
  def trainResidualIndex(in: DataFrame,
                         kCoarse: Int = KMeans.NumCells,
                         coarseRounds: Int = KMeans.NumRounds,
                         m: Int = Pq.NumSubs,
                         kSub: Int = Pq.NumCells,
                         pqRounds: Int = Pq.NumRounds): Index = {
    val vecs = graft.CacheScope.pin(in)
    val coarse = KMeans.trainedCodebook(vecs, kCoarse, coarseRounds)
    // residual build: one corpus join on the assignment (index-build
    // cost), centroid side broadcast; per-element a − b is one IEEE op,
    // bit-identical in both engines
    val resid = graft.CacheScope.pin(
      vecs.join(KMeans.assignCells(vecs, coarse), "vec_id")
        .join(broadcast(coarse), "cell")
        .select(col("vec_id"), col("cell").as("ivf_cell"),
          zip_with(col("v"), col("cv"), (a, b) => a - b).as("v")))
    val subVecs = graft.CacheScope.pin(Pq.subVectors(resid, m))
    val (codebooks, lastUpdate) = Pq.loop(subVecs, kSub, pqRounds)
    Graph.freeCheckpoint(lastUpdate)
    val codes = Pq.assignCodes(subVecs, codebooks)
      .join(resid.select(col("vec_id"), col("ivf_cell")), "vec_id")
      .select(col("vec_id"), col("ivf_cell"), col("sub"), col("code"))
    Index(coarse, codebooks, codes)
  }

  /** Encode NEW vectors under a residual index: assign → residual →
    * codes. Two broadcast passes plus one small join, no training. */
  def encodeResidual(in: DataFrame, coarse: DataFrame,
                     codebooks: DataFrame, m: Int = Pq.NumSubs): DataFrame = {
    val vecs = graft.CacheScope.pin(in)
    val resid = vecs.join(KMeans.assignCells(vecs, coarse), "vec_id")
      .join(broadcast(coarse), "cell")
      .select(col("vec_id"), col("cell").as("ivf_cell"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
    val rp = graft.CacheScope.pin(resid)
    Pq.assignCodes(Pq.subVectors(rp, m), codebooks)
      .join(rp.select(col("vec_id"), col("ivf_cell")), "vec_id")
      .select(col("vec_id"), col("ivf_cell"), col("sub"), col("code"))
  }

  /** Cell-restricted ADC over a RESIDUAL index: the lookup tables are
    * per-(query, probed cell) — the query's residual against cell c is
    * q − centroid(c), so each probed cell gets its own M×K table. The
    * codes join keys on (ivf_cell, sub, code), which restricts to
    * probed cells AND selects the matching per-cell table in ONE
    * broadcast join. */
  def searchResidual(queries: DataFrame, index: Index,
                     probeCells: Int = ProbeCells, topK: Int = TopK,
                     m: Int = Pq.NumSubs): DataFrame = {
    val q = graft.CacheScope.pin(queries)
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("score"), col("cell"))
    val probes = q.crossJoin(broadcast(index.coarse))
      .select(col("query_id"), col("cell"),
        (graft.functions.ArrayDot(col("cv"), col("cv")) -
         lit(2.0) * graft.functions.ArrayDot(col("v"), col("cv")))
          .as("score"))
      .withColumn("crank", row_number().over(pw))
      .filter(col("crank") <= probeCells)
      .select(col("query_id"), col("cell").as("ivf_cell"))
    // per-(query, probed cell) residual, sliced into subvectors with
    // the cell key carried (Pq.subVectors drops extra columns)
    val d = size(col("v"))
    val qres = probes
      .join(q, "query_id")
      .join(broadcast(index.coarse.withColumnRenamed("cell", "ivf_cell")),
            "ivf_cell")
      .select(col("query_id"), col("ivf_cell"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
    val qsub = qres
      .select(col("query_id"), col("ivf_cell"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("v"))
      .select(col("query_id"), col("ivf_cell"),
        col("sub").cast(LongType).as("sub"),
        slice(col("v"), (col("sub") * (d / m) + 1).cast(IntegerType),
              (d / m).cast(IntegerType)).as("sv"))
    val qd = qsub
      .join(broadcast(index.codebooks), "sub")
      .select(col("query_id"), col("ivf_cell"), col("sub"),
        col("cell").as("code"),
        floor((graft.functions.ArrayDot(col("sv"), col("sv")) +
               graft.functions.ArrayDot(col("cv"), col("cv")) -
               lit(2.0) * graft.functions.ArrayDot(col("sv"), col("cv")))
              * lit(1000000L)).cast(LongType).as("d2_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_ppm"), col("nn_id"))
    index.codes.join(broadcast(qd), Seq("ivf_cell", "sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("nn_id"))
      .agg(sum(col("d2_ppm")).as("adc_ppm"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("nn_id"), col("adc_ppm"))
  }

  /** Gate query for the residual index — output contract identical to
    * [[knnIvfPq]], so IvfPqSpec measures both recalls side by side. */
  def knnIvfAdc(spark: SparkSession, dir: String,
                numQueries: Int = NumQueries, probeCells: Int = ProbeCells,
                topK: Int = TopK): DataFrame = {
    val index = trainResidualIndex(vecsOf(spark, dir))
    graft.Present.sorted(
      searchResidual(
        vecsOf(spark, dir).filter(col("vec_id") < numQueries)
          .select(col("vec_id").as("query_id"), col("v")),
        index, probeCells, topK),
      col("query_id"), col("rank"))
  }

  /** MAINTENANCE for the persisted codes layout. [[encode]] appends
    * each ingest batch as a new file-set inside every touched
    * `ivf_cell=` directory, so after B batches a probe of p cells
    * opens O(p·B) small files — footer and open costs compound
    * exactly like the streaming-sink fragmentation
    * [[graft.ops.Layout]] exists for. This rewrites each inverted
    * list as contiguous files: ONE shuffle keyed by `ivf_cell` (each
    * cell lands wholly in one task → one file per cell directory),
    * rows sorted (vec_id, sub) within the list so a future reader's
    * row-group stats stay tight, written beside the live layout and
    * swapped in with two renames. The swap assumes a SINGLE WRITER
    * and NO CONCURRENT READER: between rename(live→old) and
    * rename(tmp→live) there is a window where no `codes/` directory
    * exists, so a reader racing the swap can observe a missing path
    * (never a half-written mix — each layout is only renamed whole).
    * Deployments that need concurrent readers should publish via a
    * versioned directory plus a pointer file instead; this in-place
    * swap is the maintenance-window spelling. Rows are BIT-IDENTICAL
    * and the `ivf_cell=` directory scheme is unchanged, so file-level
    * pruning keeps working (both pinned in IvfPqSpec).
    *
    * What compaction does NOT fix: LIST imbalance. When
    * [[ivfPqStats]]' `imbalance_ppm` reports a cell at ≳4× its fair
    * share (4,000,000 ppm), probe tail latency is dominated by that
    * list however few files it has — the remedy is RETRAINING the
    * coarse quantizer (and re-encoding, a full [[writeIndex]] cycle),
    * not compaction. That threshold is the documented rebalance
    * trigger; compaction is the cheap, frequent op (per ingest day),
    * retraining the rare, corpus-priced one. */
  def compactCodes(spark: SparkSession, dir: String): Unit = {
    val live = s"$dir/codes"
    val tmp  = s"$dir/codes_compacting"
    val old  = s"$dir/codes_old"
    spark.read.parquet(live)
      .select(col("vec_id"), col("ivf_cell").cast(LongType).as("ivf_cell"),
              col("sub"), col("code"))
      .repartition(col("ivf_cell"))
      .sortWithinPartitions(col("ivf_cell"), col("vec_id"), col("sub"))
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(new java.net.URI(live), spark.sessionState.newHadoopConf())
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    fs.delete(p(old), true)
    if (!fs.rename(p(live), p(old)))
      throw new java.io.IOException(s"compact: could not retire $live")
    if (!fs.rename(p(tmp), p(live))) {
      fs.rename(p(old), p(live)) // roll back — the old layout is intact
      fs.delete(p(tmp), true)    // don't strand the compacted copy
      throw new java.io.IOException(s"compact: could not publish $tmp")
    }
    fs.delete(p(old), true); ()
  }

  /** Inverted-list statistics of the trained index — the operational
    * report an ANN deployment watches alongside recall: probe latency
    * is proportional to the probed cells' LIST SIZES, so the
    * imbalance factor (cell size / mean size) is the worst-case probe
    * multiplier, and a degenerate coarse codebook (one mega-cell)
    * shows up here long before it shows up as tail latency. One
    * aggregate over the assignment (the codes' sub = 0 slice — one
    * row per vector), 1-row totals broadcast back; output is
    * integer-exact end-to-end (the [[Card]] discipline: ppm via
    * integer DIV, no float reaches the gate). */
  def ivfPqStats(spark: SparkSession, dir: String): DataFrame = {
    val index = trainIndex(vecsOf(spark, dir))
    val cells = index.codes.filter(col("sub") === 0)
      .groupBy(col("ivf_cell")).agg(count(lit(1)).as("n_vectors"))
    val tot = cells.agg(sum(col("n_vectors")).as("n_total"),
                        count(lit(1)).as("n_cells"))
    graft.Present.sorted(
      cells.crossJoin(broadcast(tot))
        .select(col("ivf_cell"), col("n_vectors"),
          expr("CAST(n_vectors * 1000000 DIV n_total AS BIGINT)")
            .as("share_ppm"),
          expr("CAST(n_vectors * n_cells * 1000000 DIV n_total AS BIGINT)")
            .as("imbalance_ppm")),
      col("ivf_cell"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_ivf_pq"  -> ((s, d) => knnIvfPq(s, d)),
    "knn_ivfadc"  -> ((s, d) => knnIvfAdc(s, d)),
    "ivfpq_stats" -> ((s, d) => ivfPqStats(s, d)))

  // ---- oracles: BOTH unrolled trainer chains composed in one WITH,
  //      coarse under the "k" prefix, PQ under "p" — the fragments are
  //      the trainers' own generators, so the chains can't drift ----

  /** Shared probe CTE: top-[[ProbeCells]] coarse cells per query. */
  private def probesSql: String =
    s"""pr AS (
       |  SELECT query_id, cell AS ivf_cell FROM (
       |    SELECT q.vec_id AS query_id, c.cell,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_dot_product(c.cv, c.cv)
       |          - 2 * list_dot_product(q.v, c.cv), c.cell) AS crank
       |    FROM kv q CROSS JOIN kc${KMeans.NumRounds} c
       |    WHERE q.vec_id < $NumQueries)
       |  WHERE crank <= $ProbeCells)""".stripMargin

  /** Shared ranked-top-k tail over `s(query_id, nn_id, adc_ppm)`. */
  private def rankSql: String =
    s"""SELECT query_id, CAST(rank AS BIGINT) AS rank, nn_id, adc_ppm
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |              ORDER BY adc_ppm, nn_id) AS rank FROM s)
       |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin

  val oracles: Map[String, String] = Map(
    "ivfpq_stats" ->
      s"""WITH ${KMeans.vCtes(KMeans.NumCells, "k")},
         |${KMeans.roundCtes(KMeans.NumRounds, "k")},
         |asg AS (${KMeans.assignSql(KMeans.NumRounds, "k")}),
         |c AS (SELECT cell AS ivf_cell, CAST(count(*) AS BIGINT) AS n_vectors
         |      FROM asg GROUP BY 1),
         |t AS (SELECT CAST(sum(n_vectors) AS BIGINT) AS n_total,
         |             CAST(count(*) AS BIGINT) AS n_cells FROM c)
         |SELECT ivf_cell, n_vectors,
         |  CAST(n_vectors * 1000000 // n_total AS BIGINT) AS share_ppm,
         |  CAST(n_vectors * n_cells * 1000000 // n_total AS BIGINT)
         |    AS imbalance_ppm
         |FROM c CROSS JOIN t ORDER BY ivf_cell""".stripMargin,
    "knn_ivfadc" ->
      s"""WITH ${KMeans.vCtes(KMeans.NumCells, "k")},
         |${KMeans.roundCtes(KMeans.NumRounds, "k")},
         |asg AS (${KMeans.assignSql(KMeans.NumRounds, "k")}),
         |rv AS MATERIALIZED (
         |  SELECT a.vec_id, a.cell AS ivf_cell,
         |    list_transform(list_zip(x.v, c.cv),
         |                   z -> struct_extract(z, 1) - struct_extract(z, 2))
         |      AS v
         |  FROM asg a JOIN kv x ON x.vec_id = a.vec_id
         |             JOIN kc${KMeans.NumRounds} c ON c.cell = a.cell),
         |${Pq.subCtesFrom("(SELECT vec_id, v FROM rv)", "p")},
         |${Pq.roundCtes(Pq.NumRounds, "p")},
         |codes0 AS (${Pq.codesSql(Pq.NumRounds, "p")}),
         |codes AS (
         |  SELECT c.vec_id, r.ivf_cell, c.sub, c.code
         |  FROM codes0 c JOIN rv r ON r.vec_id = c.vec_id),
         |$probesSql,
         |qr AS (
         |  SELECT pr.query_id, pr.ivf_cell,
         |    list_transform(list_zip(x.v, cc.cv),
         |                   z -> struct_extract(z, 1) - struct_extract(z, 2))
         |      AS v
         |  FROM pr JOIN kv x ON x.vec_id = pr.query_id
         |          JOIN kc${KMeans.NumRounds} cc ON cc.cell = pr.ivf_cell),
         |qs AS (
         |  SELECT query_id, ivf_cell, sub,
         |    v[sub * (len(v) / ${Pq.NumSubs}) + 1 :
         |      (sub + 1) * (len(v) / ${Pq.NumSubs})] AS sv
         |  FROM (SELECT query_id, ivf_cell, v,
         |          unnest(range(0, ${Pq.NumSubs})) AS sub FROM qr)),
         |qd AS (
         |  SELECT qs.query_id, qs.ivf_cell, qs.sub, c.cell AS code,
         |    CAST(floor((list_dot_product(qs.sv, qs.sv)
         |                + list_dot_product(c.cv, c.cv)
         |                - 2 * list_dot_product(qs.sv, c.cv)) * 1000000)
         |         AS BIGINT) AS d2_ppm
         |  FROM qs JOIN pc${Pq.NumRounds} c ON c.sub = qs.sub),
         |s AS (
         |  SELECT qd.query_id, codes.vec_id AS nn_id,
         |    CAST(sum(qd.d2_ppm) AS BIGINT) AS adc_ppm
         |  FROM codes
         |  JOIN qd ON qd.ivf_cell = codes.ivf_cell
         |         AND qd.sub = codes.sub AND qd.code = codes.code
         |  WHERE codes.vec_id <> qd.query_id
         |  GROUP BY 1, 2)
         |$rankSql""".stripMargin,
    "knn_ivf_pq" ->
      s"""WITH ${KMeans.vCtes(KMeans.NumCells, "k")},
         |${KMeans.roundCtes(KMeans.NumRounds, "k")},
         |asg AS (${KMeans.assignSql(KMeans.NumRounds, "k")}),
         |${Pq.subCtes("p")},
         |${Pq.roundCtes(Pq.NumRounds, "p")},
         |codes AS (${Pq.codesSql(Pq.NumRounds, "p")}),
         |qd AS (${Pq.qdSql(Pq.NumRounds, NumQueries, "p")}),
         |$probesSql,
         |s AS (
         |  SELECT qd.query_id, codes.vec_id AS nn_id,
         |    CAST(sum(qd.d2_ppm) AS BIGINT) AS adc_ppm
         |  FROM codes
         |  JOIN asg ON asg.vec_id = codes.vec_id
         |  JOIN pr ON pr.ivf_cell = asg.cell
         |  JOIN qd ON qd.query_id = pr.query_id AND qd.sub = codes.sub
         |         AND qd.cell = codes.code
         |  WHERE codes.vec_id <> qd.query_id
         |  GROUP BY 1, 2)
         |$rankSql""".stripMargin)
}
