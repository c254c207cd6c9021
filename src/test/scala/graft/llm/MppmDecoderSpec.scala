package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Multimodal.MppmDecoder

/** Pins the REAL motion-PPM frame walk ([[Multimodal.MppmDecoder]] —
  * consecutive binary P6 frames, the ffmpeg image2pipe PPM stream) on
  * hand-built containers: multi-frame parse with exact per-frame stats,
  * the strict exact-consumption contract (truncated tail frame or
  * trailing garbage fails the WHOLE container), and the entry plumbing
  * (the video quarter decodes for real, everything else stays on the
  * labeled stub path). */
class MppmDecoderSpec extends SparkSpec {

  /** One hand P6 frame: 1×2 pixels (6 payload bytes). */
  private def frame(px: Array[Byte]): Array[Byte] = {
    require(px.length == 6)
    "P6\n1 2\n255\n".getBytes("US-ASCII") ++ px
  }

  test("two-frame container: frame boundaries, dims, exact channel sums") {
    val f1 = frame(Array[Byte](10, 20, 30, 40, 50, 60))
    val f2 = frame(Array[Byte](70, 80, 90, 100, 110, 120))
    val frames = MppmDecoder.decode(f1 ++ f2).get
    assert(frames.size == 2)
    assert(frames(0).width == 1 && frames(0).height == 2)
    assert(frames(0).sums.toSeq == Seq(10 + 40, 20 + 50, 30 + 60))
    assert(frames(1).sums.toSeq == Seq(70 + 100, 80 + 110, 90 + 120))
    // frame pixel regions tile the stream exactly
    assert(frames(0).pixEnd == f1.length)
    assert(frames(1).pixStart == f1.length + ("P6\n1 2\n255\n").length)
    assert(frames(1).pixEnd == f1.length + f2.length)
  }

  test("a single well-formed frame is a 1-frame video") {
    val f1 = frame(Array[Byte](1, 2, 3, 4, 5, 6))
    assert(MppmDecoder.decode(f1).get.size == 1)
  }

  test("truncated tail frame or trailing garbage fails the whole container") {
    val f1 = frame(Array[Byte](10, 20, 30, 40, 50, 60))
    val f2 = frame(Array[Byte](70, 80, 90, 100, 110, 120))
    // tail frame missing its last pixel byte
    assert(MppmDecoder.decode(f1 ++ f2.dropRight(1)).isEmpty)
    // trailing garbage after a clean frame sequence
    assert(MppmDecoder.decode(f1 ++ f2 ++ Array[Byte]('x')).isEmpty)
    // second frame with corrupt magic
    val bad = f2.clone(); bad(0) = 'Q'
    assert(MppmDecoder.decode(f1 ++ bad).isEmpty)
    // empty stream is not a video
    assert(MppmDecoder.decode(Array.emptyByteArray).isEmpty)
  }

  test("hostile header dims bail out instead of overflowing") {
    val huge = "P6\n99999999999 2\n255\n".getBytes("US-ASCII") ++
      new Array[Byte](64)
    assert(MppmDecoder.decode(huge).isEmpty)
  }

  test("entry plumbing: video quarter decodes for real, rest stays stub") {
    val out = Multimodal.frameSamples(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      if (id % 4 == 2) {
        assert(r.getAs[String]("kind") == "video/mppm", s"id $id")
        assert(r.getAs[Long]("width") == Multimodal.PpmWidth, s"id $id")
        assert(!r.isNullAt(r.fieldIndex("mean_r")), s"id $id")
      } else {
        assert(r.isNullAt(r.fieldIndex("width")), s"id $id")
        assert(r.isNullAt(r.fieldIndex("mean_r")), s"id $id")
      }
    }
    // the sampling budget: stride = max(1, n/4) caps samples at 7 per
    // item (n < 8 keeps stride 1 and all n frames; n >= 8 yields <= 5)
    val perItem = Multimodal.frameSamples(spark, sf001)
      .groupBy(col("media_id")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(perItem <= 7L)
  }
}
