package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.ZOrder]] layout contract: files clustered on the z-curve
  * carry per-file min/max stats that prune on BOTH dimensions, where a
  * 1-D sort prunes on its sort key only. Proven from the written files
  * themselves, like LayoutSpec. */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark.spark

  // sf0.01, not the suite default sf0.001: per-file min/max geometry
  // needs enough rows (10k) and a wide enough key domain (150 users ×
  // 490 value units) for 16 files to have measurable shapes; at sf0.001
  // the whole user domain is 15 values and every box covers everything.
  private val sfDir = "/root/testdata/sf0.01"
  private val NFiles = 16

  /** Per-file [min, max] of `dim`, from the written files. */
  private def fileStats(back: DataFrame, dim: String): Array[(Long, Long)] =
    back.groupBy(input_file_name().as("f"))
      .agg(min(col(dim)).cast("long").as("lo"), max(col(dim)).cast("long").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))

  /** Files a zone-map reader must touch for dim ∈ [lo, hi]. */
  private def candidates(stats: Array[(Long, Long)], lo: Long, hi: Long): Int =
    stats.count { case (mn, mx) => mx >= lo && mn <= hi }

  test("z-order prunes both dimensions; 1-D sort only its own key") {
    val ev = Tables.events(spark, sfDir)
      .withColumn("vb", floor(col("value")).cast("long"))
    val zPath = java.nio.file.Files.createTempDirectory("graft_z").toString
    val sPath = java.nio.file.Files.createTempDirectory("graft_s").toString

    // binned variant: `value` is heavily skewed (94% of mass in the
    // bottom quarter of its domain), exactly the case equi-depth
    // binning exists for — the raw curve would waste most cells on the
    // sparse tail
    val zBack = ops.ZOrder.zorderWriteBinned(ev, "user_id", "vb", NFiles, zPath)
    // baseline: same file count, classic 1-D sort on user_id
    val sBack = ops.Layout.compactSorted(ev, "user_id", NFiles, sPath)

    // row set preserved, file count hit
    assert(zBack.count() === ev.count())
    val zU = fileStats(zBack, "user_id"); val zV = fileStats(zBack, "vb")
    val sU = fileStats(sBack, "user_id"); val sV = fileStats(sBack, "vb")
    assert(zU.length === NFiles, s"expected $NFiles files, got ${zU.length}")

    // box predicates: the bottom QUARTER OF THE DATA MASS per dimension
    // (user_id is uniform so domain- and mass-quarter coincide; vb's
    // mass quarter is [0, p25] = [0, 14] at this SF)
    val (uLo, uHi) = (0L, 37L)
    val (vLo, vHi) = (0L, 14L)

    // 1-D layout: perfect on its own key, BLIND on the other
    assert(candidates(sU, uLo, uHi) <= NFiles / 2)
    assert(candidates(sV, vLo, vHi) === NFiles,
           "1-D baseline unexpectedly pruned the secondary dim — " +
             "the comparison below would be vacuous")

    // z-order: BOTH dims prune. The curve trades the primary dim's
    // perfect clustering for coverage of both, so the bar is "each dim
    // prunes meaningfully", not "as tight as a dedicated sort".
    val zu = candidates(zU, uLo, uHi)
    val zv = candidates(zV, vLo, vHi)
    assert(zu <= NFiles * 3 / 4, s"no pruning on user_id: $zu/$NFiles")
    assert(zv <= NFiles * 3 / 4, s"no pruning on vb: $zv/$NFiles")
    assert(zu + zv < 2 * NFiles * 3 / 4,
           s"weak two-dim pruning: user=$zu vb=$zv of $NFiles")
    // and the box query (both predicates) touches the intersection-ish
    // set — strictly better than the 1-D layout's value-blind scan
    assert(math.min(zu, zv) < candidates(sV, vLo, vHi))
  }

  test("zValue is the exact bit interleave on known points") {
    import spark.implicits._
    val pts = Seq[(Long, Long, Long)](
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 0L, 4L), (0L, 2L, 8L), (3L, 3L, 15L),
      (65535L, 0L, 0x55555555L), (0L, 65535L, 0xAAAAAAAAL),
      // clamping: negative floors to 0, overflow saturates
      (-5L, 0L, 0L), (1L << 40, 0L, 0x55555555L))
    val got = pts.toDF("x", "y", "want")
      .withColumn("z", ops.ZOrder.zValue(col("x"), col("y")))
      .filter(col("z") =!= col("want")).count()
    assert(got === 0)
  }
}
