package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization via native `session_window` — the streaming
  * twin of the batch gaps-and-islands [[graft.ops.Sessionize]] (one
  * shuffle, lag + running sum) and of the batch session-window candles
  * ([[graft.ops.Candles]], `candles_session`).
  *
  * Why the native operator and not `flatMapGroupsWithState`: Spark's
  * session window MERGES overlapping per-key windows in the state store
  * as events arrive (two fragments that an out-of-order event bridges
  * become one session — semantics a hand-rolled gap tracker gets wrong
  * exactly on late data), evicts a session's state and EMITS it only
  * when the watermark passes `session_end + gap` (append mode: each
  * session is output exactly once, final), and keeps per-key state
  * bounded by open sessions × session length, not stream length.
  *
  * Scale posture: one hash Exchange on the session key (user), same as
  * the batch form; the merge-capable session state store is Spark 4's
  * `RocksDBStateStoreProvider` path (set in [[graft.Sessions]]), so open
  * sessions spill rather than occupy heap. A user with a pathological
  * never-closing session is the skew case: the gap bounds it — no event
  * for `gap` closes the session regardless of stream volume.
  */
object SessionWindows {

  /** Per-user sessions with a `gap` inactivity timeout: (user_id,
    * session start/end, n_events, duration). Append mode — rows are
    * final; requires the watermark so sessions can close. */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
                   watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        (unix_millis(col("session_window.end")) -
           unix_millis(col("session_window.start"))).as("duration_ms"))
}
