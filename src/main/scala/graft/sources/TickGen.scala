package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic synthetic tick-message generator.
  *
  * Maps each `events` row to one wire-format tick JSON message with the
  * exact nested shape the full tick schema declares
  * (graft.schema.Schemas.tick; reference: data_processor.py:20-63), so the
  * parse operators can be exercised — and oracle-verified — without a live
  * WebSocket/Kafka ingress (reference ingress: data_streamer.py:83-106 is
  * out of engine scope, SURVEY.md §2.A5).
  *
  * Every derived field is a pure IEEE-754/integer function of the source
  * row, so a DuckDB oracle can recompute the expected post-parse values
  * directly from `events` — the JSON round trip must be value-exact.
  * All generation is columnar (`to_json(struct(...))`): codegen'd,
  * no UDFs, fully distributed.
  */
object TickGen {

  /** Field derivations shared between the generator and oracle SQL.
    * instrument := event_type, ltp := value, ltq := props.k,
    * ltt/currentTs := epoch-millis(ts) as string. */
  private def k: Column = get_json_object(col("props"), "$.k").cast(IntegerType)
  private def lttMs: Column = unix_millis(col("ts").cast(TimestampType))

  private def quote(bp: Column, ap: Column, q: Column): Column = struct(
    q.cast(StringType).as("bidQ"), bp.as("bidP"),
    q.cast(StringType).as("askQ"), ap.as("askP"))

  /** events(event_id, ts, user_id, event_type, value, props) →
    * (event_id, ts, event_type, value, k, json_str).
    *
    * `k` and `ltt_ms` are projected ONCE before the struct build: the
    * message references them ~10 times each, and as raw expressions every
    * reference would re-run the JSON path lookup / timestamp conversion
    * per use (expression-tree CSE does not reach inside a single to_json
    * argument). */
  def ticksFromEvents(events: DataFrame): DataFrame = {
    val pre = events.select(col("event_id"), col("ts"), col("user_id"),
                            col("event_type"), col("value"),
                            k.as("k"), lttMs.as("ltt_ms"))
    val v = col("value")
    val msg = struct(
      lit("live_feed").as("type"),
      map(
        col("event_type"),
        struct(
          struct(
            struct(
              struct(v.as("ltp"), col("ltt_ms").cast(StringType).as("ltt"),
                     col("k").cast(StringType).as("ltq"), (v * 0.5).as("cp")).as("ltpc"),
              struct(array(
                quote(v * 0.999, v * 1.001, col("k")),
                quote(v * 0.998, v * 1.002, col("k") + lit(1))).as("bidAskQuote")).as("marketLevel"),
              struct().as("optionGreeks"),
              struct(array(struct(
                lit("I1").as("interval"), v.as("open"), (v * 1.01).as("high"),
                (v * 0.99).as("low"), (v * 1.005).as("close"),
                (col("k") * 10).cast(StringType).as("vol"),
                col("ltt_ms").cast(StringType).as("ts"))).as("ohlc")).as("marketOHLC"),
              (v * 1.0005).as("atp"),
              (col("k") * 100).cast(StringType).as("vtt"),
              (col("k") + col("user_id")).cast(DoubleType).as("tbq"),
              col("k").cast(DoubleType).as("tsq")
            ).as("marketFF"),
            lit("full_d30").as("requestMode")
          ).as("fullFeed")
        )
      ).as("feeds"),
      col("ltt_ms").cast(StringType).as("currentTs"))

    pre.select(col("event_id"), col("ts"), col("event_type"), col("value"),
               col("k"), to_json(msg).as("json_str"))
  }

  /** Flat candle-shaped JSON per event row (13 columns of
    * graft.schema.Schemas.candle; reference wire format:
    * candle_to_hdfs.py:11-25).
    *
    * `k` is projected ONCE before the struct build, same as
    * [[ticksFromEvents]]: the message references it seven times, and as a
    * raw expression each reference re-runs the get_json_object path
    * lookup per row (CSE does not reach inside a single to_json
    * argument). */
  def candleJsonFromEvents(events: DataFrame): DataFrame = {
    val pre = events.select(col("event_id"), col("ts"), col("user_id"),
                            col("event_type"), col("value"), k.as("k"))
    val kk = col("k")
    val v = col("value")
    val ws = date_trunc("minute", col("ts")).cast(TimestampNTZType)
    val msg = struct(
      col("event_type").as("instrument"),
      ws.as("window_start"),
      (ws + expr("INTERVAL 1 MINUTE")).as("window_end"),
      v.as("open"), (v * 1.01).as("high"), (v * 0.99).as("low"), (v * 1.005).as("close"),
      kk.as("buy_volume"), (kk % lit(5)).as("sell_volume"),
      (kk + (kk % lit(5))).as("total_volume"), (kk - (kk % lit(5))).as("delta"),
      (kk + col("user_id")).cast(DoubleType).as("tbq"), kk.cast(DoubleType).as("tsq"))
    pre.select(col("event_id"), to_json(msg).as("json_str"))
  }
}
