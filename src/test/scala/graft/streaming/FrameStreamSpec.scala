package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.llm.Multimodal
import graft.llm.Multimodal.MediaBlob

/** Pins [[FrameDecodeStream]]: motion-PPM containers frame-walked as
  * they arrive across micro-batches equal the batch decoder row for row
  * (the frame walk is stateless per row — stream == batch by
  * construction, and this pins the construction), including a malformed
  * container taking the stub fallback mid-stream. */
class FrameStreamSpec extends SparkSpec {
  import spark.implicits._

  /** One hand P6 frame: 1×2 pixels (6 payload bytes). */
  private def frame(px: Array[Byte]): Array[Byte] = {
    require(px.length == 6)
    "P6\n1 2\n255\n".getBytes("US-ASCII") ++ px
  }

  private val twoFrames =
    frame(Array[Byte](10, 20, 30, 40, 50, 60)) ++
      frame(Array[Byte](70, 80, 90, 100, 110, 120))

  private val blobs = Seq(
    MediaBlob(2L, twoFrames, "video/mppm"),
    MediaBlob(3L, "not a video".getBytes("UTF-8"), "src1"),
    // truncated tail frame -> the WHOLE container stubs
    MediaBlob(6L, twoFrames.dropRight(1), "video/mppm"))

  test("cross-batch streamed frame decode equals the batch decoder") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MediaBlob]
    val q = Multimodal.frameRowsOf(mem.toDS()).toDF().writeStream
      .format("memory").queryName("fds")
      .outputMode(OutputMode.Append())
      .start()
    mem.addData(blobs(0))
    q.processAllAvailable()
    mem.addData(blobs(1), blobs(2))
    q.processAllAvailable()
    val streamed = spark.table("fds").orderBy("media_id", "frame_idx")
      .collect().map(_.toSeq).toSeq
    q.stop()

    val batch = Multimodal.frameRowsOf(blobs.toDS())
      .toDF().orderBy("media_id", "frame_idx")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)

    val byKey = spark.table("fds").collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r).toMap
    // the 2-frame video decoded for real: both frames sampled
    // (stride = max(1, 2/4) = 1), pixel hashes + means present
    assert(byKey((2L, 0L)).getAs[String]("kind") == "video/mppm")
    assert(byKey((2L, 0L)).getAs[Long]("n_frames") == 2L)
    assert(byKey((2L, 0L)).getAs[Double]("mean_r") == (10 + 40) / 2.0)
    assert(byKey((2L, 1L)).getAs[Double]("mean_b") == (90 + 120) / 2.0)
    // the opaque and the truncated containers both stubbed (null stats)
    for (id <- Seq(3L, 6L)) {
      val r = byKey((id, 0L))
      assert(r.isNullAt(r.fieldIndex("mean_r")), s"id $id")
      assert(r.isNullAt(r.fieldIndex("width")), s"id $id")
    }
  }
}
