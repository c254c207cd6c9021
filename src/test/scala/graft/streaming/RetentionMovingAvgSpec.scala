package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

/** Pins cohort retention and the RANGE-frame moving average
  * ([[Events.retentionOf]] / [[Events.movingAvgOf]], r13): offset-0
  * retention is 1.0 by construction, multi-day activity lands in the
  * right (cohort, offset) cells, and the time-RANGE frame SHRINKS over
  * calendar gaps instead of sliding over a fixed row count. */
class RetentionMovingAvgSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int, h: Int = 9) =
    Timestamp.valueOf(f"2026-03-$d%02d $h%02d:00:00")

  test("retention cells, sizes, and the offset-0 invariant") {
    // cohort day 1: users 1, 2 — user 1 returns on days 2 and 4, user 2
    // only on day 2; cohort day 3: user 3, never returns
    val e = Seq(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(4)), (1L, ts(4, 23)),
      (2L, ts(1)), (2L, ts(2)),
      (3L, ts(3)))
      .toDF("user_id", "ts")
    val got = Events.retentionOf(e).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got == Map(
      ("2026-03-01", 0L) -> ((2L, 2L, 1.0)),
      ("2026-03-01", 1L) -> ((2L, 2L, 1.0)),
      ("2026-03-01", 3L) -> ((1L, 2L, 0.5)),
      ("2026-03-03", 0L) -> ((1L, 1L, 1.0))))
    assert(got.collect { case ((_, 0L), v) => v._3 }.forall(_ == 1.0))
  }

  test("the RANGE frame shrinks over calendar gaps") {
    // type a: days 1 (2 events), 2 (4), 5 (6) — day 5's trailing 3-day
    // window covers days 3..5, i.e. ONLY day 5 (gap days are absent, a
    // ROWS frame would wrongly reach back to days 1-2)
    val e = Seq(
      ("a", ts(1)), ("a", ts(1, 10)),
      ("a", ts(2)), ("a", ts(2, 10)), ("a", ts(2, 11)), ("a", ts(2, 12)),
      ("a", ts(5)), ("a", ts(5, 10)), ("a", ts(5, 11)), ("a", ts(5, 12)),
      ("a", ts(5, 13)), ("a", ts(5, 14)))
      .toDF("event_type", "ts")
    val got = Events.movingAvgOf(e).collect()
      .map(r => r.getTimestamp(0).toString.take(10) ->
        (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got("2026-03-01") == ((2L, 2.0)))
    assert(got("2026-03-02") == ((4L, 3.0)))   // (2+4)/2
    assert(got("2026-03-05") == ((6L, 6.0)))   // gap: only day 5 in range
  }
}
