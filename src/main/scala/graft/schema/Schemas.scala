package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the engine's three message shapes, mirroring the
  * reference's schema-on-read contracts (SURVEY.md §1.2):
  *
  *  - [[tick]]: the full 6-deep nested market tick
  *    (reference: data_processor.py:20-63)
  *  - [[tickLtt]]: the PARTIAL schema for the same messages, declaring only
  *    the `feeds → fullFeed → marketFF → ltpc → ltt` path — the engine must
  *    tolerate parsing a subset of fields from identical JSON
  *    (reference: tick_to_hdfs.py:32-42)
  *  - [[candle]]: the flat 13-column candle record
  *    (reference: candle_to_hdfs.py:11-25), with timestamps as
  *    TIMESTAMP_NTZ per the engine's UTC-naive policy (see graft.Tables)
  *
  * Unknown JSON fields are dropped by `from_json`; missing fields become
  * null — schemas are contracts, never inferred.
  */
object Schemas {

  /** ltpc: last-traded price/time/quantity + close price. Prices DOUBLE;
    * ltt (epoch-ms) and ltq carried as STRING and cast late, exactly as
    * the wire format does. */
  val ltpc: StructType = StructType(Seq(
    StructField("ltp", DoubleType),
    StructField("ltt", StringType),
    StructField("ltq", StringType),
    StructField("cp", DoubleType)))

  val bidAskQuote: StructType = StructType(Seq(
    StructField("bidQ", StringType),
    StructField("bidP", DoubleType),
    StructField("askQ", StringType),
    StructField("askP", DoubleType)))

  val ohlcEntry: StructType = StructType(Seq(
    StructField("interval", StringType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("vol", StringType),
    StructField("ts", StringType)))

  val marketFF: StructType = StructType(Seq(
    StructField("ltpc", ltpc),
    StructField("marketLevel", StructType(Seq(
      StructField("bidAskQuote", ArrayType(bidAskQuote))))),
    StructField("optionGreeks", StructType(Nil)), // empty struct, as declared upstream
    StructField("marketOHLC", StructType(Seq(
      StructField("ohlc", ArrayType(ohlcEntry))))),
    StructField("atp", DoubleType),
    StructField("vtt", StringType),
    StructField("tbq", DoubleType),
    StructField("tsq", DoubleType)))

  /** Full tick message: feeds is a MAP keyed by instrument id. */
  val tick: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("feeds", MapType(StringType, StructType(Seq(
      StructField("fullFeed", StructType(Seq(
        StructField("marketFF", marketFF),
        StructField("requestMode", StringType)))))))),
    StructField("currentTs", StringType)))

  /** Partial schema: only the ltt path, proving schema-pruned parse of the
    * same messages. */
  val tickLtt: StructType = {
    val ltpcLtt = StructType(Seq(StructField("ltt", StringType)))
    val mff     = StructType(Seq(StructField("ltpc", ltpcLtt)))
    val full    = StructType(Seq(StructField("marketFF", mff)))
    val feedVal = StructType(Seq(StructField("fullFeed", full)))
    StructType(Seq(StructField("feeds", MapType(StringType, feedVal))))
  }

  /** Flat candle record. */
  val candle: StructType = StructType(Seq(
    StructField("instrument", StringType),
    StructField("window_start", TimestampNTZType),
    StructField("window_end", TimestampNTZType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("buy_volume", IntegerType),
    StructField("sell_volume", IntegerType),
    StructField("total_volume", IntegerType),
    StructField("delta", IntegerType),
    StructField("tbq", DoubleType),
    StructField("tsq", DoubleType)))
}

/** Typed row models for module-boundary Datasets. */
case class Candle(
    instrument: String,
    window_start: java.time.LocalDateTime,
    window_end: java.time.LocalDateTime,
    open: Double, high: Double, low: Double, close: Double,
    buy_volume: Int, sell_volume: Int, total_volume: Int, delta: Int,
    tbq: Double, tsq: Double)
