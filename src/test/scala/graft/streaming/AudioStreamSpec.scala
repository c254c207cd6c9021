package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.llm.Multimodal
import graft.llm.Multimodal.MediaBlob

/** Pins [[AudioDecodeStream]]: containers decoded as they arrive across
  * micro-batches equal the batch decoder row for row (the decode is
  * stateless per row — stream == batch by construction, and this pins
  * the construction). */
class AudioStreamSpec extends SparkSpec {
  import spark.implicits._

  private val blobs = Seq(
    MediaBlob(1L, Multimodal.wavContainer(Array[Byte](10, 20, 30, 40)),
      "audio/wav"),
    MediaBlob(2L, "not audio at all".getBytes("UTF-8"), "src3"),
    MediaBlob(5L, Multimodal.wavContainer(Array[Byte](7, 7)), "audio/wav"))

  test("cross-batch streamed decode equals the batch decoder") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MediaBlob]
    val q = AudioDecodeStream.decodedOf(mem.toDS()).toDF().writeStream
      .format("memory").queryName("ads")
      .outputMode(OutputMode.Append())
      .start()
    mem.addData(blobs(0))
    q.processAllAvailable()
    mem.addData(blobs(1), blobs(2))
    q.processAllAvailable()
    val streamed = spark.table("ads").orderBy("media_id")
      .collect().map(_.toSeq).toSeq
    q.stop()

    val batch = AudioDecodeStream.decodedOf(blobs.toDS())
      .toDF().orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.length == 3)
    // the wav rows parsed, the opaque row stubbed
    val byId = spark.table("ads").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[String]("kind") == "audio/wav")
    assert(!byId(1L).isNullAt(byId(1L).fieldIndex("mean_amp")))
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("mean_amp")))
  }
}
