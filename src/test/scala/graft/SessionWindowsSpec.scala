package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.SessionWindows

/** [[graft.stream.SessionWindows]] semantics that only a STREAM shows:
  * out-of-order events merge session fragments in the state store, and
  * a session is emitted exactly once, final, only after the watermark
  * proves its gap elapsed. */
class SessionWindowsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("late event bridges two fragments; sessions emit once, closed by watermark") {
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = SessionWindows.userSessions(
      input.toDF().toDF("user_id", "ts"),
      gap = "30 seconds", watermark = "60 seconds")
    val q = sessions.writeStream.format("memory")
      .queryName("graft_sessions").outputMode("append").start()
    try {
      // user 1: one session (0s, 10s); user 2: two fragments (0s, 50s)
      input.addData((1L, ts(0)), (1L, ts(10)), (2L, ts(0)), (2L, ts(50)))
      q.processAllAvailable()
      // late bridge for user 2 (25s < watermark horizon thanks to the
      // 60s delay): the two fragments must MERGE into one session
      input.addData((2L, ts(25)))
      q.processAllAvailable()
      assert(spark.table("graft_sessions").count() === 0,
             "no session may emit before the watermark passes its gap")
      // sentinel far ahead: watermark 1000-60=940 closes everything open
      input.addData((99L, ts(1000)))
      q.processAllAvailable()
      val rows = spark.table("graft_sessions")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
                   r.getTimestamp(2).getTime / 1000, r.getLong(3),
                   r.getLong(4)))
        .sortBy(r => (r._1, r._2))
      assert(rows === Array(
        (1L, 0L, 40L, 2L, 40000L),   // 0..10, closed at 10+30
        (2L, 0L, 80L, 3L, 80000L)),  // MERGED 0..50, closed at 50+30
        s"got ${rows.mkString(", ")}")
      // user 99's session (end 1030 > watermark 940) must still be open
      assert(!rows.exists(_._1 == 99L))
    } finally q.stop()
  }
}
