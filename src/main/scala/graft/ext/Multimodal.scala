package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Multimodal column handling — the training-data-pipeline surface for
  * image/audio/video payloads (BASELINE.json north_star).
  *
  * The design: media is an opaque BINARY column plus a typed metadata
  * struct (format, width, height, n_frames), the layout a 100 TB corpus
  * actually uses (bytes in parquet/object store, metadata queryable
  * without touching the bytes — column pruning means a metadata-only
  * query never reads a single payload byte).
  *
  * DECODE IS A STUB: this container has no image/audio codecs, so the
  * "decoder" is a deterministic function of the payload bytes
  * ([[fakeLuma]]), clearly marked below. In production it would be a
  * `mapPartitions` (or Python `mapInPandas`) batch decode feeding the
  * same output schema — everything around the stub (payload synthesis,
  * binary column plumbing, metadata schema, per-frame explode shape,
  * partition-parallel layout) is real and gate-verified.
  *
  * Payloads are synthesized from `documents.text` bytes so the DuckDB
  * oracle can reproduce every value (encode → BLOB on its side).
  */
object Multimodal {

  /** documents → (doc_id, payload BINARY, format, width, height,
    * n_frames) — the standing multimodal table shape. */
  def media(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav")),
                 (col("doc_id") % 3 + 1).cast(IntegerType)).as("format"),
      ((col("n_chars") % 32 + 1) * 16).as("width"),
      ((col("n_chars") % 24 + 1) * 16).as("height"),
      (col("n_chars") % 30 + 2).as("n_frames"))

  /** ==== THE DECODE STUB ====
    * Stands in for codec output (e.g. mean luma of a decoded image):
    * a deterministic projection of the payload digest. Swap for a real
    * decoder inside mapPartitions without touching the query shape. */
  private def fakeLuma(payload: Column): Column =
    (conv(substring(md5(payload), 1, 4), 16, 10).cast(IntegerType) % 256)
      .as("decoded_mean_luma")

  /** Feature extraction: byte length, content digest, container header
    * bytes (hex), decode-stub feature — plus the metadata carried along.
    * A real pipeline runs this shape once at ingest and stores the
    * features columnar next to the payload. */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .select(
        col("doc_id"), col("format"), col("width"), col("height"),
        octet_length(col("payload")).cast(LongType).as("byte_len"),
        md5(col("payload")).as("digest"),
        // hex ONLY the 4 header bytes: hexing the whole payload would
        // materialize a 2×payload-length string per row before the
        // truncate — a real allocation tax at 100 TB of media bytes.
        // (The oracle spells it substr(hex(payload),1,8) — DuckDB 1.0
        // can't slice BLOBs — which is value-identical for any length:
        // hex of the first min(4,len) bytes IS the first min(8,2·len)
        // hex chars.)
        hex(substring(col("payload"), 1, 4)).as("header_hex"),
        fakeLuma(col("payload")))
      .presentSorted(col("doc_id"))

  /** Resize: pure metadata transform — new dimensions at target width
    * 64 preserving aspect ratio (integer floor, like a real thumbnailer
    * pass); the payload column is untouched and therefore never read. */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .select(
        col("doc_id"), col("width"), col("height"),
        lit(64).as("new_width"),
        expr("(height * 64) DIV width").as("new_height"),
        (col("width").cast(DoubleType) / col("height")).as("aspect"))
      .presentSorted(col("doc_id"))

  /** Frame sampling: every 4th frame index per "video", one output row
    * per sampled frame with a per-frame signature (decode-stub again).
    * The explode multiplies rows inside the scan stage — no shuffle. */
  def mmFrames(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .select(col("doc_id"), col("n_frames"),
              explode(sequence(lit(0), col("n_frames") - 1, lit(4)))
                .as("frame_idx"))
      .select(
        col("doc_id"), col("n_frames"), col("frame_idx"),
        md5(concat(col("doc_id").cast(StringType), lit(":"),
                   col("frame_idx").cast(StringType))).as("frame_sig"))
      .presentSorted(col("doc_id"), col("frame_idx"))

  /** Hamming radius for [[mmDedup]]'s verify: a planted twin differs
    * in ≤ 3 of 64 dHash bits (two perturbed tiles touch at most three
    * adjacent-pixel comparisons), while independent payloads sit at
    * Hamming ≈ 32 (sd ≈ 4) — 4 separates the populations by ≫ 5σ. */
  private val MmHammingMax = 4

  /** Grid geometry for the dHash: 8 rows × 9 columns of tiles, 8
    * row-adjacent comparisons per row → 64 signature bits. */
  private val GridRows = 8
  private val GridCols = 9

  /** Perceptual-hash IMAGE near-dup pairing — the dedup rung for the
    * multimodal payloads: text has MinHash/SimHash/ExactSubstr,
    * embeddings have cosine/SemDeDup; re-encoded or lightly-edited
    * images need a signature of the DECODED PICTURE, not the container
    * bytes (same picture, different bytes ⇒ equal exact digests never
    * match). The standard answer is dHash (difference hash, Krawetz
    * 2013): downscale to an (rows × cols) grayscale grid, emit one bit
    * per row-adjacent pixel pair (right > left), pair signatures by
    * Hamming distance.
    *
    * The GRID IS THE DECODE-STUB SEAM (this container has no codecs —
    * the module-level contract): tile luma is a deterministic
    * projection of the payload digest, exactly [[fakeLuma]] extended
    * to 72 tiles, and each doc plants a NEAR-DUP TWIN (−doc_id − 1,
    * [[Dedup.dedupSimhashPairs]]'s collision-free mirror) whose grid
    * differs in two tiles — the grid-level image of a local edit or
    * re-encode, which the real decoder would produce from a truly
    * edited image. Swapping in a real decoder changes only the luma
    * source; the signature build, the planted-pair contract, and the
    * pairing join are production-shaped.
    *
    * Plan shape: ONE wide per-row projection (72 shared luma
    * subexpressions → two 64-term signatures, whole-stage codegen, no
    * shuffle, no aggregate — cf. the simhash build, which needs a
    * 65-sum aggregate because its per-TOKEN evidence must reduce), a
    * 2-struct explode for base+twin, then the SHARED
    * [[Dedup.bandedHammingPairs]] — one banded self-equi-join, never
    * all-pairs, `bit_count` verify per-row on the join output. */
  def mmDedup(spark: SparkSession, dir: String,
              hammingMax: Int = MmHammingMax): DataFrame = {
    val nTiles = GridRows * GridCols
    // one digest per payload; each tile hashes (digest : tile_index)
    val base = media(spark, dir)
      .select(col("doc_id"), md5(col("payload")).as("dg"))
    def rawLuma(i: Int): Column =
      conv(substring(md5(concat(col("dg"), lit(":" + i))), 1, 2), 16, 10)
        .cast(LongType)
    val grid = base.select(
      col("doc_id") +: (0 until nTiles).map(i => rawLuma(i).as(s"l$i")): _*)
    def lumaB(i: Int): Column = col(s"l$i")
    // the twin's "local edit": tiles 0 and 40 brightened by 16 (mod
    // 256 wrap keeps the value a valid luma in both engines)
    def lumaT(i: Int): Column =
      if (i == 0 || i == 40) (lumaB(i) + 16) % 256 else lumaB(i)
    def sigOf(luma: Int => Column): Column =
      (0 until 64).map { j =>
        val tile = (j / 8) * GridCols + j % 8
        when(luma(tile + 1) > luma(tile),
          lit(if (j == 63) Long.MinValue else 1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val sigs = grid.select(explode(array(
        struct(col("doc_id").as("doc_id"), sigOf(lumaB).as("sig")),
        struct((-col("doc_id") - 1).as("doc_id"), sigOf(lumaT).as("sig"))))
      .as("r"))
      .select(col("r.*"))
    graft.Present.sorted(Dedup.bandedHammingPairs(sigs, hammingMax),
      col("doc_a"), col("doc_b"))
  }

  /** One media row as the partition-decode path sees it. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String,
                      width: Long, height: Long, n_frames: Long)
  case class DecodedMedia(doc_id: Long, decoded_mean_luma: Int)

  /** ==== THE DECODE SWAP PATH, EXECUTABLE ====
    *
    * Partition-batched decode: `decoder` runs ONCE per executor
    * partition over an iterator of media rows — exactly the seam where a
    * real codec plugs in (JNI/FFI library handle opened once per
    * partition, or a Python worker via `mapInPandas` in PySpark — same
    * batch-iterator contract). The engine-side plumbing this proves:
    * binary rows reach the decoder batched and partition-parallel, no
    * per-row setup cost, output is a typed Dataset that joins back on
    * doc_id.
    *
    * The default decoder is the SAME deterministic fake as [[fakeLuma]]
    * (no codecs exist in this container), so MultimodalSpec can assert
    * the mapPartitions path and the codegen'd expression path agree
    * bit-for-bit — swapping in a real codec changes only the lambda. */
  def decodePartitions(media: DataFrame,
      decoder: Iterator[MediaRow] => Iterator[DecodedMedia] = defaultDecoder)
      : org.apache.spark.sql.Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media
      .select(col("doc_id").cast(LongType).as("doc_id"), col("payload"),
              col("format"), col("width").cast(LongType).as("width"),
              col("height").cast(LongType).as("height"),
              col("n_frames").cast(LongType).as("n_frames"))
      .as[MediaRow]
      .mapPartitions(decoder)
  }

  /** Deterministic stand-in decoder: md5(payload) first 4 hex digits
    * mod 256 — the exact value [[fakeLuma]] computes in SQL. */
  def defaultDecoder(rows: Iterator[MediaRow]): Iterator[DecodedMedia] = {
    // one "codec handle" per partition, reused across the batch — the
    // cost model a real decoder needs
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { r =>
      md.reset()
      val hex = md.digest(r.payload).map("%02x".format(_)).mkString
      DecodedMedia(r.doc_id, Integer.parseInt(hex.take(4), 16) % 256)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> mmFeatures _,
    "mm_resize"   -> mmResize _,
    "mm_frames"   -> mmFrames _,
    "mm_dedup"    -> ((s, d) => mmDedup(s, d)))

  private val mediaSql =
    """(SELECT doc_id, encode(text) AS payload,
      |  ['png', 'jpeg', 'wav'][CAST(doc_id % 3 + 1 AS INTEGER)] AS format,
      |  (n_chars % 32 + 1) * 16 AS width,
      |  (n_chars % 24 + 1) * 16 AS height,
      |  n_chars % 30 + 2 AS n_frames,
      |  text
      |FROM documents) m""".stripMargin

  /** dHash bit terms over a 1-based DuckDB list `l` of tile lumas;
    * `tl` renders the lookup for a 0-based tile index (the twin wraps
    * two tiles). Bit 63's weight spelled `(-MAX - 1)` so the literal
    * parses as BIGINT. */
  private def dhashTermsSql(tl: Int => String): String = (0 until 64).map { j =>
    val tile = (j / 8) * GridCols + j % 8
    val w = if (j == 63) "(-9223372036854775807 - 1)" else (1L << j).toString
    s"CASE WHEN ${tl(tile + 1)} > ${tl(tile)} THEN $w ELSE 0 END"
  }.mkString("\n    + ")

  private def baseTile(i: Int): String = s"l[${i + 1}]"
  private def twinTile(i: Int): String =
    if (i == 0 || i == 40) s"((l[${i + 1}] + 16) % 256)" else baseTile(i)

  val oracles: Map[String, String] = Map(
    "mm_dedup" ->
      s"""WITH m AS (SELECT doc_id, md5(text) AS dg FROM documents),
         |g AS (
         |  SELECT doc_id, i,
         |    ('0x' || substr(md5(dg || ':' || i), 1, 2))::BIGINT AS luma
         |  FROM (SELECT doc_id, dg,
         |          unnest(range(0, ${GridRows * GridCols})) AS i FROM m)),
         |l AS MATERIALIZED (SELECT doc_id, array_agg(luma ORDER BY i) AS l
         |      FROM g GROUP BY 1),
         |s AS MATERIALIZED (
         |  SELECT doc_id, CAST(${dhashTermsSql(baseTile)} AS BIGINT) AS sig
         |  FROM l
         |  UNION ALL
         |  SELECT -doc_id - 1, CAST(${dhashTermsSql(twinTile)} AS BIGINT) AS sig
         |  FROM l),
         |${Dedup.bandPairSql(MmHammingMax)}""".stripMargin,
    "mm_features" ->
      s"""SELECT doc_id, format, width, height,
         |  CAST(octet_length(payload) AS BIGINT) AS byte_len,
         |  md5(text) AS digest,
         |  substr(hex(payload), 1, 8) AS header_hex,
         |  ('0x' || substr(md5(text), 1, 4))::INTEGER % 256 AS decoded_mean_luma
         |FROM $mediaSql ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      s"""SELECT doc_id, width, height, 64 AS new_width,
         |  (height * 64) // width AS new_height,
         |  CAST(width AS DOUBLE) / height AS aspect
         |FROM $mediaSql ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      s"""SELECT doc_id, n_frames, unnest(range(0, n_frames, 4)) AS frame_idx,
         |  md5(doc_id || ':' || unnest(range(0, n_frames, 4))) AS frame_sig
         |FROM $mediaSql ORDER BY doc_id, frame_idx""".stripMargin)
}
