package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** [[Attribution.join]] semantics MemoryStream can pin and the file-stream
  * entry cannot: a purchase arriving micro-batches AFTER its click still
  * joins (two-sided state retention), pairs outside the attribution window
  * never emit, and the batch twin agrees with the streaming output on the
  * same data (stream-batch equivalence at spec scale). */
class AttributionSpec extends SparkSpec {
  import spark.implicits._
  import AttributionSpec.{Click, Purchase}

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cross-batch interval join: late purchase finds buffered click; out-of-window pairs don't emit") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = Attribution.join(
      purchases.toDF().withWatermark("purchase_ts", "10 minutes"),
      clicks.toDF().withWatermark("click_ts", "10 minutes"))
    val q = joined
      .select(col("purchase_event_id"), col("click_event_id"))
      .writeStream
      .format("memory")
      .queryName("stream_attribution")
      .outputMode(OutputMode.Append())
      .start()

    // batch 1: clicks only — nothing can emit yet
    clicks.addData(
      Click(11L, ts("2024-01-01 00:00:00"), 1L),
      Click(12L, ts("2024-01-01 00:30:00"), 1L),
      Click(13L, ts("2024-01-01 00:00:00"), 2L))
    q.processAllAvailable()
    assert(spark.table("stream_attribution").count() === 0)

    // batch 2: purchases arrive LATER — user 1 at 00:45 attributes to both
    // of user 1's clicks (00:00 within 60 min, 00:30 within); user 2 at
    // 02:00 is outside its click's window → no pair; user 3 has no click
    purchases.addData(
      Purchase(21L, ts("2024-01-01 00:45:00"), 1L, 9.0),
      Purchase(22L, ts("2024-01-01 02:00:00"), 2L, 5.0),
      Purchase(23L, ts("2024-01-01 00:10:00"), 3L, 7.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("stream_attribution")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(out === Seq((21L, 11L), (21L, 12L)))
  }

  test("batch twin produces the same pairs on the same relation") {
    val p = Seq(
      (21L, ts("2024-01-01 00:45:00"), 1L, 9.0),
      (22L, ts("2024-01-01 02:00:00"), 2L, 5.0))
      .toDF("purchase_event_id", "purchase_ts", "user_id", "value")
    val c = Seq(
      (11L, ts("2024-01-01 00:00:00"), 1L),
      (12L, ts("2024-01-01 00:30:00"), 1L),
      (13L, ts("2024-01-01 00:00:00"), 2L))
      .toDF("click_event_id", "click_ts", "user_id")
    val out = Attribution.join(p, c)
      .select(col("purchase_event_id"), col("click_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(out === Seq((21L, 11L), (21L, 12L)))
  }
}

object AttributionSpec {
  case class Click(click_event_id: Long, click_ts: Timestamp, user_id: Long)
  case class Purchase(purchase_event_id: Long, purchase_ts: Timestamp,
    user_id: Long, value: Double)
}
