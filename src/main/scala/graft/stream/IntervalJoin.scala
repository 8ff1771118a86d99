package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming twin of the batch
  * [[graft.ops.TimeJoins]] range join: pair each trade with the quotes
  * for the same instrument in the trailing interval
  * `[trade_ts − maxLag, trade_ts]`, while both sides are unbounded
  * streams.
  *
  * Spark executes this as a symmetric hash join whose per-key state is
  * BOUNDED by the watermark + the time-range predicate: a buffered quote
  * can only ever match trades with `trade_ts ≤ quote_ts + maxLag`, so
  * once the trade-side watermark passes that point the quote's state row
  * is evicted (and symmetrically for buffered trades). Without the range
  * predicate the state is unbounded — which is why [[quotesNearTrades]]
  * hard-requires both watermarks and embeds the interval in the join
  * condition instead of filtering after a plain key join.
  *
  * Scale posture: state is partitioned by the equi-key (instrument), the
  * same hash Exchange a batch join would make; state size per key is
  * O(events within maxLag), independent of stream length. A hot
  * instrument concentrates state in one partition — the mitigation is
  * the same as the batch as-of join's (AQE cannot re-plan streaming
  * state, so maxLag is the dial: at 100 TB/day, 10 minutes of one
  * instrument must fit one executor's state store, which HDFS-backed
  * RocksDB state handles by spilling).
  */
object IntervalJoin {

  /** Inner (or left-outer) interval join.
    *
    * @param trades   streaming frame with (instrument, trade_id, trade_ts)
    * @param quotes   streaming frame with (instrument, quote_id, quote_ts)
    * @param maxLag   width of the trailing match interval
    * @param watermark how late either stream's events may arrive; also
    *                 the left-outer null-emission delay — an unmatched
    *                 trade is emitted null-padded once the quote-side
    *                 watermark proves no matching quote can still arrive
    * @param joinType "inner" or "leftOuter" (the two stream-stream types
    *                 with bounded state for this shape)
    */
  def quotesNearTrades(trades: DataFrame, quotes: DataFrame,
                       maxLag: String = "10 minutes",
                       watermark: String = "5 minutes",
                       joinType: String = "inner"): DataFrame = {
    val t = trades.withWatermark("trade_ts", watermark)
    val q = quotes.withColumnRenamed("instrument", "q_instrument")
      .withWatermark("quote_ts", watermark)
    t.join(q,
      col("instrument") === col("q_instrument") &&
        col("quote_ts") >= col("trade_ts") - expr(s"INTERVAL $maxLag") &&
        col("quote_ts") <= col("trade_ts"),
      joinType)
      .select(col("instrument"), col("trade_id"), col("trade_ts"),
              col("quote_id"), col("quote_ts"))
  }
}
