package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Bloom-filter semi-join reduction — prune the FACT side of a
  * selective join before its shuffle, with a compact filter built in
  * one pass over the (already-filtered) dim keys.
  *
  * The 100 TB problem this solves: in `fact ⋈ σ(dim)` where the dim
  * predicate is selective but the dim key set is still too large to
  * broadcast as an exact hash relation, both sides shuffle — and the
  * fact exchange moves ~100 TB to keep ~2% of it. A Bloom filter of the
  * dim keys is a few MB regardless of fact size; shipping it to the
  * fact scan drops (1 − selectivity − fpp) of the fact rows BEFORE the
  * exchange, so shuffled bytes scale with the MATCHING rows. False
  * positives only leak extra rows into the exact join, which drops
  * them — the result is bit-identical to the plain join, which is
  * exactly what the oracle checks.
  *
  * Spark's own `InjectRuntimeFilter` (`spark.sql.optimizer.runtime
  * .bloomFilter.enabled`) does this adaptively inside one query; this
  * operator is the EXPLICIT form for when the automatic one can't see
  * the opportunity — a filter reused across queries, a join split by an
  * intermediate materialization, or thresholds that don't fire. Same
  * machinery: the probe is Spark's native codegen'd
  * `BloomFilterMightContain` expression (registered as
  * `bloom_might_contain` by [[graft.functions.GraftExtensions]]), NOT a
  * Scala UDF, so the fact-side filter stays inside whole-stage codegen.
  */
object BloomJoin {

  /** One-pass distributed build over `dim`'s `key` column, serialized
    * to the byte form [[mightContain]] probes. The filter is
    * O(expectedItems·ln(1/fpp)) BITS — independent of fact size — and
    * rides the plan as a literal. Production sizes `expectedItems` from
    * table stats; oversizing only wastes the few MB, undersizing only
    * raises fpp (correctness unaffected either way). */
  def buildKeyFilter(dim: DataFrame, key: String,
                     expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = dim.stat.bloomFilter(key, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Probe column: true iff `key` MIGHT be in the serialized filter
    * (never false-negative). Codegen'd native expression. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    call_function("bloom_might_contain", lit(bloom), key)

  /** Gate query: revenue items of urgent orders, with the lineitem side
    * bloom-pruned before the join. The oracle is the PLAIN join — the
    * gate hash-verifies that bloom false positives never reach the
    * output. */
  def bloomPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = buildKeyFilter(urgent, "o_orderkey", 100000L, 0.03)
    val pruned = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .filter(mightContain(bloom, col("l_orderkey")))
    pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_quantity").cast(DecimalType(28, 6))).cast(DoubleType)
             .as("sum_qty"))
      .presentSorted(col("l_returnflag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bloom_prune_join" -> bloomPrunedJoin _)

  val oracles: Map[String, String] = Map(
    "bloom_prune_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
