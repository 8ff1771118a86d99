package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.Present.PresentOps

/** Z-order (Morton-curve) layout — MULTI-dimension zone-map pruning,
  * where [[Layout.compactSorted]] is the single-dimension answer.
  *
  * A file layout sorted on one key prunes range predicates on THAT key
  * only: every file spans the full range of every other column, so a
  * predicate on a second dimension scans the whole table. Interleaving
  * the bits of two keys into one scalar (the Morton/Z curve) and
  * range-clustering files on IT makes each file cover a RECTANGLE-ish
  * region of the (x, y) plane — per-file min/max footer stats then
  * tighten on BOTH columns at once, and a box predicate on either (or
  * both) prunes whole files. This is the same layout primitive Delta's
  * OPTIMIZE ZORDER BY and Iceberg's sort-order z-curves expose; here it
  * is ~20 lines over `repartitionByRange` + `sortWithinPartitions`
  * because the engine already had the clustering machinery.
  *
  * Scale: identical cost shape to [[Layout.compactSorted]] — one
  * sampled range Exchange on the z scalar plus a per-partition sort, no
  * driver materialization; at 100 TB it runs per date-partition with
  * `targetFiles` sized to ~128 MB-1 GB files. The z computation itself
  * is pure codegen'd bit arithmetic (no UDF): 2·bits shift-mask terms.
  *
  * Dimension prep: z-ordering interleaves NON-NEGATIVE integers. Each
  * dim is clamped to [0, 2^bits) here; production maps arbitrary
  * domains onto that grid first (rank- or quantile-binning for skewed
  * or floating domains — the curve needs uniform-ish bit utilization to
  * cut space into balanced cells, and raw skewed values waste high
  * bits). Two dims cover the common (tenant_id, time-bucket) /
  * (user, metric) cases; more dims generalize the same interleave at
  * proportionally fewer bits per dim.
  */
object ZOrder {

  /** Morton-interleave two clamped `bits`-bit dims: x takes even bit
    * positions, y odd. Pure integer expressions — whole-stage-codegen
    * eligible, bit-identical in any engine with `>> << &`. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    def clamp(c: Column): Column =
      least(greatest(c.cast(LongType), lit(0L)), lit((1L << bits) - 1))
    val (cx, cy) = (clamp(x), clamp(y))
    (0 until bits).map { i =>
      shiftleft(shiftright(cx, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(cy, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Rewrite `df` as `targetFiles` files range-clustered and internally
    * sorted on the z-curve of (`dimX`, `dimY`), and return the re-read
    * frame. The helper column is dropped before the write — pruning
    * rides the DIMS' own per-file min/max stats, which the z clustering
    * is what tightens. */
  def zorderWrite(df: DataFrame, dimX: String, dimY: String,
                  targetFiles: Int, path: String, bits: Int = 16): DataFrame = {
    df.withColumn("__graft_z", zValue(col(dimX), col(dimY), bits))
      .repartitionByRange(targetFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Equi-depth bin id (0-based) of `dim` over `df`'s own distribution:
    * boundaries from `approxQuantile` (one sampling pass, bounded error —
    * the same economics as RangePartitioner's boundary sample), bin
    * assignment as a codegen'd fold over the broadcast boundary array
    * (`size(filter(bounds, b -> b <= v))` — no UDF, no extra shuffle).
    * Duplicate quantiles on heavy-hitter values collapse to fewer bins,
    * which is the correct degradation: a value owning > 1/nBins of the
    * mass cannot be split by any monotone binning. */
  def equiDepthBin(df: DataFrame, dim: String, nBins: Int): Column = {
    val probs = (1 until nBins).map(_.toDouble / nBins).toArray
    val bounds = df.stat.approxQuantile(dim, probs, 0.001).distinct.sorted
    val arr = array(bounds.map(lit(_)): _*)
    size(filter(arr, b => b <= col(dim).cast("double"))).cast(LongType)
  }

  /** [[zorderWrite]] over equi-DEPTH bins of each dimension — the form
    * that survives skewed real-world axes. Interleaving RAW values gives
    * a skewed axis most of the curve's cells for its sparse tail (94% of
    * `events.value` mass sits in the bottom quarter of its domain, so a
    * raw curve packs 94% of rows into a handful of cells and per-file
    * stats stop pruning). Rank-binning first makes every cell carry
    * ~equal row mass — per-file min/max then tighten on both RAW columns
    * wherever the data is dense, which is where queries land. This is
    * the same prep Delta's OPTIMIZE ZORDER BY applies (per-column range
    * partition ids before interleaving). */
  def zorderWriteBinned(df: DataFrame, dimX: String, dimY: String,
                        targetFiles: Int, path: String,
                        binBits: Int = 8): DataFrame = {
    val nBins = 1 << binBits
    df.withColumn("__graft_z",
        zValue(equiDepthBin(df, dimX, nBins), equiDepthBin(df, dimY, nBins),
               binBits))
      .repartitionByRange(targetFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Gate query: the z-key computation itself over `events`
    * (user_id × floor(value)), value-pinned against the same bit
    * arithmetic in DuckDB. The RAW curve is the gate (deterministic in
    * both engines); the binned variant depends on sampled quantiles, so
    * its claims — file count, two-dimension pruning beating the 1-D
    * sort — are pinned in ZOrderSpec instead. */
  def zorderKey(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
              floor(col("value")).cast(LongType).as("vb"))
      .withColumn("zval", zValue(col("user_id"), col("vb")))
      .presentSorted(col("event_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_key" -> zorderKey _)

  private val zTermsSql = (0 until 16).map { i =>
    s"((((ux >> $i) & 1) << ${2 * i}) + (((cb >> $i) & 1) << ${2 * i + 1}))"
  }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    "zorder_key" ->
      s"""WITH d AS (
         |  SELECT event_id, user_id,
         |    CAST(floor(value) AS BIGINT) AS vb,
         |    least(greatest(user_id, 0), 65535) AS ux,
         |    least(greatest(CAST(floor(value) AS BIGINT), 0), 65535) AS cb
         |  FROM events)
         |SELECT event_id, user_id, vb,
         |  CAST($zTermsSql AS BIGINT) AS zval
         |FROM d ORDER BY event_id""".stripMargin)
}
