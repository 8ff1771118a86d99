package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-aggregation contracts — the bounded-memory, MERGEABLE
  * alternatives to exact distinct/percentile at 100 TB. DuckDB's sketch
  * implementations differ bit-for-bit, so these cannot be gate queries;
  * the spec pins the properties that make them production-usable
  * instead: error within the advertised bound against the exact answer
  * (which ops/Stats computes as a gate query), and sketch MERGE
  * associativity — partial sketches built per series union into the
  * global estimate, which is precisely why one pass over 1000 executors
  * works. */
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
}
