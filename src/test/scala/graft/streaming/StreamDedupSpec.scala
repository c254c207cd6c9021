package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** [[StreamDedup.dedupe]] semantics MemoryStream can pin and the
  * duplicated-file-stream entry cannot: duplicates arriving in LATER
  * micro-batches (cross-batch state), and the watermark bound on that
  * state (a key re-delivered after its entry expired is admitted again —
  * the documented contract, not a bug). */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._
  import StreamDedupSpec.Rec

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cross-batch duplicates are dropped; expired keys re-admit") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Rec]
    val q = StreamDedup.dedupe(mem.toDS(), "10 minutes", "event_id")
      .writeStream
      .format("memory")
      .queryName("stream_dedup")
      .outputMode(OutputMode.Append())
      .start()

    // batch 1: two records + an in-batch duplicate of id 1
    mem.addData(
      Rec(1L, ts("2024-01-01 00:00:00"), 1.0),
      Rec(2L, ts("2024-01-01 00:01:00"), 2.0),
      Rec(1L, ts("2024-01-01 00:00:00"), 1.0))
    q.processAllAvailable()
    // batch 2: id 2 re-delivered (cross-batch, inside the watermark
    // horizon) → dropped; id 3 is new → admitted
    mem.addData(
      Rec(2L, ts("2024-01-01 00:01:00"), 2.0),
      Rec(3L, ts("2024-01-01 00:05:00"), 3.0))
    q.processAllAvailable()
    // batch 3: far-future record advances the watermark well past the
    // horizon, expiring all state
    mem.addData(Rec(9L, ts("2024-01-01 09:00:00"), 9.0))
    q.processAllAvailable()
    // batch 4: id 1 re-delivered AFTER expiry (and within the new
    // watermark) → admitted again: state is bounded, by contract
    mem.addData(Rec(1L, ts("2024-01-01 08:55:00"), 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("stream_dedup")
      .select(col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    assert(out === Seq((1L, 1.0), (1L, 1.0), (2L, 2.0), (3L, 3.0), (9L, 9.0)))
  }
}

object StreamDedupSpec {
  case class Rec(event_id: Long, ts: Timestamp, value: Double)
}
