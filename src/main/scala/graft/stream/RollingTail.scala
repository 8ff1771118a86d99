package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema.Candle

/** The dashboard's bounded rolling tail as a DISTRIBUTED stateful
  * streaming operator (SURVEY §2.E10 / §1.1: the reference keeps
  * `deque(maxlen=100)` of candles per instrument CLIENT-side and
  * recomputes stats on every update, data_plotter.py:15,274–295 — a
  * single-process consumer that cannot scale past one machine's Kafka
  * read).
  *
  * Here the same semantics run inside the engine via
  * `KeyValueGroupedDataset.flatMapGroupsWithState`: state is the last
  * [[RollingTail.MaxTail]] closes per instrument — explicitly BOUNDED, so
  * per-key state bytes are O(MaxTail) regardless of stream length — and
  * each micro-batch emits one refreshed stat row per updated instrument
  * (Update mode, exactly the dashboard's "recompute on update" contract).
  *
  * Scale posture: state lives in the state store, partitioned by
  * instrument hash — thousands of instruments spread over executors; no
  * driver involvement, no unbounded growth, checkpoint-recoverable like
  * any stateful query.
  *
  * Ordering: rows are folded in window_start order within a micro-batch;
  * across batches arrival order governs (the candle stream from the
  * processor is watermark-finalized, hence near-ordered). The batch twin
  * with total-order semantics is ops/Rollups.tail100Stats.
  */
object RollingTail {

  val MaxTail = 100

  /** Bounded per-instrument state: closes of the last [[MaxTail]]
    * candles, oldest first. */
  case class TailState(closes: List[Double])

  case class TailStats(
      instrument: String,
      as_of: java.time.LocalDateTime, // window_start of the newest candle folded
      n: Int,
      avg_close: Double, min_close: Double, max_close: Double)

  /** candles → per-instrument rolling-tail stats, one row per instrument
    * per micro-batch that touched it. Works on batch Datasets too (Spark
    * runs the same function with a single all-rows "batch"). */
  def stats(candles: Dataset[Candle], maxTail: Int = MaxTail): Dataset[TailStats] = {
    require(maxTail >= 1, s"maxTail must be >= 1, got $maxTail")
    import candles.sparkSession.implicits._
    candles
      .groupByKey(_.instrument)
      .flatMapGroupsWithState[TailState, TailStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (instrument, rows, state: GroupState[TailState]) =>
          // Bounded fold: a normal micro-batch is small, but a replay /
          // backfill can deliver millions of rows for ONE instrument, and
          // materializing them (toSeq.sort) spikes a single task's heap.
          // Only the newest MaxTail rows can survive the takeRight, so a
          // size-(MaxTail+1) min-heap streams the iterator in O(MaxTail)
          // memory; the arrival index breaks window_start ties exactly
          // like the stable sort it replaces.
          val cmp = new java.util.Comparator[(Candle, Long)] {
            def compare(x: (Candle, Long), y: (Candle, Long)): Int = {
              val c = x._1.window_start.compareTo(y._1.window_start)
              if (c != 0) c else java.lang.Long.compare(x._2, y._2)
            }
          }
          val heap = new java.util.PriorityQueue[(Candle, Long)](maxTail + 1, cmp)
          var idx = 0L
          rows.foreach { c =>
            heap.add((c, idx)); idx += 1
            if (heap.size > maxTail) heap.poll()
          }
          if (idx == 0L) Iterator.empty
          else {
            val kept = new Array[(Candle, Long)](heap.size)
            var i = 0 // poll() drains oldest-first: kept ends up in fold order
            while (i < kept.length) { kept(i) = heap.poll(); i += 1 }
            val prior = state.getOption.map(_.closes).getOrElse(Nil)
            val tail  = (prior ++ kept.map(_._1.close)).takeRight(maxTail)
            state.update(TailState(tail))
            Iterator.single(TailStats(
              instrument,
              kept.last._1.window_start,
              tail.length,
              tail.sum / tail.length, tail.min, tail.max))
          }
      }
  }
}
