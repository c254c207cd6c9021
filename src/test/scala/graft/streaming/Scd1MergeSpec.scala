package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the SCD1 MERGE fold ([[Scd1MergeStream.mergeBatch]]) on hand
  * fixtures: matched-update vs not-matched-insert, the (ts, event_id)
  * recency guard (a LATE-arriving older event must NOT overwrite a
  * newer profile), batching-order invariance, and replay idempotence
  * (re-merging the same batch is a no-op) — the property that makes the
  * at-least-once foreachBatch delivery effectively exactly-once. */
class Scd1MergeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private def batch(rows: (Long, Timestamp, String, Double, Long)*) =
    rows.toSeq.toDF("user_id", "ts", "event_type", "value", "event_id")

  private def emptyDim: DataFrame =
    batch().select(col("user_id"), col("ts").as("last_ts"),
      col("event_type").as("last_event_type"),
      col("value").as("last_value"), col("event_id").as("last_event_id"))

  private def snap(df: DataFrame): Set[(Long, Timestamp, String, Double, Long)] =
    df.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
      r.getDouble(3), r.getLong(4))).toSet

  // batch A: u1 at :10, u2 at :20; batch B: u1 LATER (:30), u3 new,
  // u2 EARLIER (:05 — the late-arriving older event)
  private val a = batch(
    (1L, ts(10), "view", 1.0, 100L),
    (2L, ts(20), "click", 2.0, 101L))
  private val b = batch(
    (1L, ts(30), "purchase", 3.0, 200L),
    (2L, ts(5), "view", 9.0, 201L),
    (3L, ts(15), "click", 4.0, 202L))

  private val expected = Set(
    (1L, ts(30), "purchase", 3.0, 200L), // updated by B
    (2L, ts(20), "click", 2.0, 101L), // guarded: B's older event ignored
    (3L, ts(15), "click", 4.0, 202L)) // inserted by B

  test("update + insert + recency guard in one MERGE chain") {
    val afterA = Scd1MergeStream.mergeBatch(emptyDim, a)
    assert(snap(afterA) == Set(
      (1L, ts(10), "view", 1.0, 100L), (2L, ts(20), "click", 2.0, 101L)))
    assert(snap(Scd1MergeStream.mergeBatch(afterA, b)) == expected)
  }

  test("batch order does not matter: B then A equals A then B") {
    val ba = Scd1MergeStream.mergeBatch(
      Scd1MergeStream.mergeBatch(emptyDim, b), a)
    assert(snap(ba) == expected)
  }

  test("replay idempotence: re-merging the same batch is a no-op") {
    val once = Scd1MergeStream.mergeBatch(
      Scd1MergeStream.mergeBatch(emptyDim, a), b)
    val twice = Scd1MergeStream.mergeBatch(once, b)
    assert(snap(twice) == snap(once))
    // and replaying the EARLIER batch after the later one is also a no-op
    assert(snap(Scd1MergeStream.mergeBatch(once, a)) == snap(once))
  }

  test("within-batch dedup picks the per-user latest") {
    val multi = batch(
      (7L, ts(10), "view", 1.0, 300L),
      (7L, ts(40), "purchase", 5.0, 301L),
      (7L, ts(25), "click", 2.0, 302L))
    assert(snap(Scd1MergeStream.mergeBatch(emptyDim, multi)) ==
      Set((7L, ts(40), "purchase", 5.0, 301L)))
  }

  test("end to end: the drained dim equals the global per-user argmax") {
    val dim = Scd1MergeStream.userDimMerged(spark, sf001)
    val events = EventsSource.batch(spark, sf001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val want = events.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"), col("event_id").as("last_event_id"))
      .orderBy(col("user_id"))
    assert(dim.collect().sameElements(want.collect()))
  }
}
