package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** ST3/ST4: event-time tumbling windows with a watermark, driven through
  * MemoryStream, checked against the batch equivalent (stream-batch
  * equivalence is the Structured Streaming contract). */
class EventsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming windowed aggregation matches batch; late row beyond watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "event_type", "value")

    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

    val q = agg.writeStream
      .format("memory")
      .queryName("events_windows")
      .outputMode(OutputMode.Append())
      .start()

    mem.addData(
      (ts("2024-01-01 00:05:00"), "click", 1.0),
      (ts("2024-01-01 00:40:00"), "click", 2.0),
      (ts("2024-01-01 00:55:00"), "view", 5.0))
    q.processAllAvailable()
    // advance event time far past the first window + watermark → closes it
    mem.addData((ts("2024-01-01 03:00:00"), "click", 7.0))
    q.processAllAvailable()
    // this row is 2h late relative to the watermark → must be dropped
    mem.addData((ts("2024-01-01 00:59:00"), "click", 100.0))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 06:00:00"), "click", 9.0))
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table("events_windows")
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("total"))
      .where(col("ws") === ts("2024-01-01 00:00:00"))
      .orderBy("event_type")
      .collect()

    // batch equivalent over the NON-LATE rows
    assert(emitted.map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq ==
      Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("streaming exact dedup: duplicate event ids within the watermark are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = mem.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:00:01"), 99.0), // in-batch duplicate
      (2L, ts("2024-01-01 00:01:00"), 2.0))
    q.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 00:02:00"), 98.0)) // cross-batch duplicate
    q.processAllAvailable()
    mem.addData((3L, ts("2024-01-01 05:00:00"), 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("stream_dedup")
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0))) // first wins
  }

  test("batch sessionization: gap splits, session stats") {
    import graft.streaming.Events
    // hand-built timeline: user 1 has two sessions (35-min gap), user 2 one
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    // The production reader expects nano timestamps; here we exercise the
    // session logic directly through its window expressions via a local
    // parquet round-trip of micro timestamps is not possible, so this test
    // drives the same lag/gap/cumsum pipeline inline.
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "a", 1.0),
      (2L, ts("2024-01-01 00:10:00"), 10L, "a", 2.0),
      (3L, ts("2024-01-01 00:50:00"), 10L, "b", 3.0), // 40-min gap → new session
      (4L, ts("2024-01-01 00:05:00"), 20L, "a", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")

    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = df
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new", when(col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("session_idx", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    assert(sessions == Seq((10L, 1L, 2L), (10L, 2L, 1L), (20L, 1L, 1L)))
  }
}
