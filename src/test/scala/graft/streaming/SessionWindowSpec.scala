package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native `session_window` aggregation ([[Events.sessionWindowed]]):
  * pins the break semantics (sessions MERGE at an exact-gap silence —
  * ts <= prev_end — so only strictly-greater-than-gap splits, matching
  * the lag formulation) and the output delta session_end = last_ts + gap,
  * plus full equivalence with [[Events.sessions]] on real data. */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val gapMin = Events.SessionGapMinutes

  test("exact-gap event MERGES (ts <= prev_end); one-micro-past-gap splits; end = last_ts + gap") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts(f"2024-01-01 00:$gapMin%02d:00")),      // exactly gap later → merges
      (2L, ts("2024-01-01 00:00:00")),
      (2L, ts(f"2024-01-01 00:$gapMin%02d:00.000001")) // one micro past → NEW session
    ).toDF("user_id", "t")
    val got = rows
      .groupBy(col("user_id"),
        session_window(col("t"), s"$gapMin minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("sw.start"), col("sw.end"), col("n"))
      .orderBy(col("user_id"), col("start"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))

    assert(got === Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), 2L),
      (2L, ts("2024-01-01 00:00:00"), ts(f"2024-01-01 00:$gapMin%02d:00"), 1L),
      (2L, ts(f"2024-01-01 00:$gapMin%02d:00.000001"),
        ts(f"2024-01-01 01:00:00.000001"), 1L)))
  }

  test("sf0.001: native session_window == lag formulation (no exact-gap pairs in the data)") {
    val native = Events.sessionWindowed(spark, sf001)
      .select(col("user_id"), col("session_start"),
        // map the window bound back to last-event time for comparison
        col("session_end") - expr(s"INTERVAL $gapMin MINUTES"),
        col("n_events"), col("total_value"))
      .collect().map(_.toSeq)

    val manual = Events.sessions(spark, sf001)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
      .collect().map(_.toSeq)

    // equivalence holds iff no user has two consecutive events exactly
    // gap apart (micros resolution → true of the synthetic data); if this
    // ever fires, the >=-vs-> break semantics are the first suspect
    assert(native.length === manual.length)
    assert(native.toSeq === manual.toSeq)
  }

  private def streamSessions(
      mem: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp)],
      name: String): org.apache.spark.sql.streaming.StreamingQuery =
    mem.toDF().toDF("user_id", "t")
      .withWatermark("t", "10 minutes")
      .groupBy(col("user_id"),
        session_window(col("t"), s"$gapMin minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("sw.start").as("start"),
        col("sw.end").as("end"), col("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .start()

  test("streaming (complete): a bridging event in a later batch MERGES two session states") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp)]
    val q = streamSessions(mem, "sw_merge")
    // two sessions more than a gap apart...
    mem.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:58:00")))
    q.processAllAvailable()
    assert(spark.table("sw_merge").count() === 2)
    // ...bridged by a later event: 00:29 extends [00:00,00:30) to 00:59,
    // which reaches the 00:58 session → MergingSessionsExec unifies all
    // three into one state
    mem.addData((1L, ts("2024-01-01 00:29:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sw_merge").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:28:00"), 3L)))
  }

  test("streaming (complete): an event LATE past the watermark still lands in its session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp)]
    val q = streamSessions(mem, "sw_late")
    mem.addData((1L, ts("2024-01-01 00:00:00")))
    q.processAllAvailable()
    // advance the watermark far past the first session
    mem.addData((1L, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // 00:10 is ~10h behind the watermark — complete mode keeps all state,
    // so the late event still merges into the first session (this is the
    // drain-order-independence events_session_window_streamed relies on)
    mem.addData((1L, ts("2024-01-01 00:10:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sw_late").orderBy(col("start")).collect()
      .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (ts("2024-01-01 00:00:00"), ts("2024-01-01 00:40:00"), 2L),
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"), 1L)))
  }

  test("sf0.001: events_session_window_streamed == the batch entry (stream-batch equivalence)") {
    val streamed = Events.sessionWindowStreamed(spark, sf001).collect().map(_.toSeq)
    val batch = Events.sessionWindowed(spark, sf001).collect().map(_.toSeq)
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }
}
