package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StatefulSessions.Evt

/** flatMapGroupsWithState sessionization: cross-batch state, in-batch gap
  * splits, event-time-timeout flush — output equals the batch (lag/cumsum)
  * sessionization of the same events. */
class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming sessions == batch sessions, including timeout flush") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Evt]
    val withWm = mem.toDS().withWatermark("ts", "0 seconds").as[Evt]
    val q = StatefulSessions.sessionize(withWm)
      .writeStream
      .format("memory")
      .queryName("stateful_sessions")
      .outputMode(OutputMode.Append())
      .start()

    // batch 1: user 10 starts a session (2 events, 10 min apart)
    mem.addData(
      Evt(10L, ts("2024-01-01 00:00:00"), 1.0),
      Evt(10L, ts("2024-01-01 00:10:00"), 2.0))
    q.processAllAvailable()
    // batch 2: same user, 40-min gap → closes session 1 IN the state fn;
    // also an in-batch gap for user 20 (two sessions in one batch).
    // NB: user 20's first event must be ≥ the current watermark (00:10
    // after batch 1) or the engine correctly drops it as late.
    mem.addData(
      Evt(10L, ts("2024-01-01 00:50:00"), 3.0),
      Evt(20L, ts("2024-01-01 00:20:00"), 4.0),
      Evt(20L, ts("2024-01-01 02:00:00"), 5.0))
    q.processAllAvailable()
    // batch 3: far-future event advances the watermark → event-time
    // timeouts flush every open session
    mem.addData(Evt(99L, ts("2024-01-02 00:00:00"), 0.0))
    q.processAllAvailable()
    mem.addData(Evt(98L, ts("2024-01-03 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stateful_sessions")
      .where(col("user_id").isin(10L, 20L))
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))

    assert(streamed.toSeq == Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 2L, 3.0),
      (10L, ts("2024-01-01 00:50:00"), ts("2024-01-01 00:50:00"), 1L, 3.0),
      (20L, ts("2024-01-01 00:20:00"), ts("2024-01-01 00:20:00"), 1L, 4.0),
      (20L, ts("2024-01-01 02:00:00"), ts("2024-01-01 02:00:00"), 1L, 5.0)))
  }
}
