package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Present.PresentOps

/** Typed-Dataset custom aggregation — the `Aggregator`/UDAF corner of
  * SURVEY §2.G, exercised on the one aggregate every market-data system
  * ships: VWAP (volume-weighted average price; the reference's candle agg
  * stops at plain sums, data_processor.py:145-156).
  *
  * Where it sits in the extension preference order: composed built-ins
  * (a) could express VWAP — `sum(pv)/sum(qty)` — so this module is
  * deliberately ALSO the demonstration of (b), the typed `Aggregator`:
  * case-class rows in, an exact-decimal buffer, encoder-checked at
  * compile time. The gate pins the typed path to the same hash as the
  * composed-SQL oracle, proving the two formulations agree bit-for-bit.
  *
  * Scale/precision posture: the buffer accumulates `BigDecimal` (exact,
  * associative, commutative — partition merge order cannot change the
  * result, unlike a DOUBLE accumulator) and a Long quantity. Spark plans
  * an `Aggregator` as a regular two-phase hash aggregation: partial
  * buffers per partition, one shuffle of O(groups) buffers, final merge —
  * the same economics as any built-in agg. The cost vs built-ins is
  * serialization of the buffer row per group (tiny) — NOT per input row —
  * plus losing whole-stage codegen for the reduce loop; acceptable here
  * because the input rows are pre-projected to 3 columns. The decimal
  * multiply-then-cast happens in DataFrame-land BEFORE `.as[PvRow]`
  * (double→DECIMAL(28,6), the engine's proven oracle-parity idiom) so the
  * Aggregator itself makes no rounding decisions.
  */
object TypedAgg {

  /** One pre-projected lineitem row: group key, exact price×qty, qty. */
  case class PvRow(flag: String, pv: BigDecimal, qty: Long)
  case class VwapBuf(pv: BigDecimal, qty: Long)
  case class VwapOut(sum_pv: Double, sum_qty: Long, vwap: Double)

  object VwapAgg extends Aggregator[PvRow, VwapBuf, VwapOut] {
    def zero: VwapBuf = VwapBuf(BigDecimal(0), 0L)
    def reduce(b: VwapBuf, a: PvRow): VwapBuf = VwapBuf(b.pv + a.pv, b.qty + a.qty)
    def merge(x: VwapBuf, y: VwapBuf): VwapBuf = VwapBuf(x.pv + y.pv, x.qty + y.qty)
    def finish(b: VwapBuf): VwapOut =
      VwapOut(b.pv.toDouble, b.qty, b.pv.toDouble / b.qty.toDouble)
    def bufferEncoder: Encoder[VwapBuf] = Encoders.product[VwapBuf]
    def outputEncoder: Encoder[VwapOut] = Encoders.product[VwapOut]
  }

  /** Gate query: VWAP per returnflag through the typed path. */
  def vwapTyped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"),
              (col("l_extendedprice") * col("l_quantity"))
                .cast(DecimalType(28, 6)).as("pv"),
              col("l_quantity").cast(LongType).as("qty"))
      .as[PvRow]
      .groupByKey(_.flag)
      .agg(VwapAgg.toColumn.name("v"))
      .select(col("key").as("l_returnflag"),
              col("v.sum_pv").as("sum_pv"),
              col("v.sum_qty").as("sum_qty"),
              col("v.vwap").as("vwap"))
      .presentSorted(col("l_returnflag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vwap_typed" -> vwapTyped _)

  val oracles: Map[String, String] = Map(
    "vwap_typed" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6)))
        |       AS DOUBLE) AS sum_pv,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6)))
        |       AS DOUBLE)
        |    / CAST(CAST(sum(l_quantity) AS BIGINT) AS DOUBLE) AS vwap
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
}
