package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

import graft.schema.Candle

/** Streaming EWMA (exponentially weighted moving average) of candle
  * closes per instrument — the online feature every live signal stack
  * derives first, and this engine's exercise of `transformWithState`,
  * Spark 4's arbitrary-state operator (successor of the
  * `flatMapGroupsWithState` API [[RollingTail]] uses; runs on the
  * RocksDB state store provider).
  *
  * Why this operator NEEDS arbitrary state: EWMA is a recurrence
  * (e_t = α·c_t + (1−α)·e_{t−1}) — windowed aggregation cannot express
  * it (every window would need the previous window's RESULT), and
  * recomputing from history per batch is O(stream length). A single
  * Double of state per instrument makes each candle O(1): state size is
  * O(instruments), independent of stream length — the same bounded-state
  * contract as [[RollingTail]], at 8 bytes per key the cheapest possible.
  *
  * Determinism: candles may arrive intra-batch out of event-time order
  * (shuffle order is arbitrary); the processor sorts each batch's group
  * by (window_end, instrument-unique key is implicit) before folding, so
  * the recurrence is applied in event-time order within every batch.
  * Cross-batch ordering is the streaming contract's (watermarked candles
  * arrive in finalization order); replay after a crash re-folds
  * identically because state checkpoints with the batch.
  *
  * Memory: the sort materializes each batch's PER-GROUP rows — unlike
  * [[RollingTail]]'s bounded heap this cannot be avoided, because EWMA
  * emits one output per input (nothing can be discarded) and correctness
  * requires event-time order. The bound is rows-per-instrument-per-
  * micro-batch — for 1-minute candles that is minutes-of-backfill per
  * trigger, which the trigger's `maxFilesPerTrigger`/`maxOffsetsPerTrigger`
  * admission dial already caps in any replay scenario.
  */
object Ewma {

  case class EwmaPoint(instrument: String, window_end: java.time.LocalDateTime,
                       close: Double, ewma: Double)

  class EwmaProcessor(alpha: Double)
      extends StatefulProcessor[String, Candle, EwmaPoint] {
    @transient private var state: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Double](
        "ewma", Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Candle],
                                 timers: TimerValues): Iterator[EwmaPoint] = {
      val ordered = rows.toSeq.sortBy(_.window_end)
      var e = if (state.exists()) Some(state.get()) else None
      val out = ordered.map { c =>
        val next = e match {
          case Some(prev) => alpha * c.close + (1 - alpha) * prev
          case None       => c.close // seed: first observation
        }
        e = Some(next)
        EwmaPoint(key, c.window_end, c.close, next)
      }
      e.foreach(state.update)
      out.iterator
    }
  }

  /** candles → per-instrument EWMA points (update mode: one output row
    * per input candle). */
  def ewma(candles: Dataset[Candle], alpha: Double = 0.2): Dataset[EwmaPoint] = {
    implicit val enc: Encoder[EwmaPoint] = Encoders.product[EwmaPoint]
    candles.groupByKey(_.instrument)(Encoders.STRING)
      .transformWithState(new EwmaProcessor(alpha),
                          TimeMode.None(), OutputMode.Update(), enc)
  }
}
