package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** STREAMED video-frame decode — the ingest shape of
  * [[Multimodal.frameSamples]] (r16, the [[AudioDecodeStream]]
  * discipline applied to the motion-PPM tier): containers arrive on a
  * file stream and each micro-batch runs the SAME per-partition
  * frame-walk ([[Multimodal.MppmDecoder]] via the shared
  * [[Multimodal.frameRowsOf]] core — content-sniffed magic, strict
  * exact consumption, stub fallback). The decode is stateless per row
  * (a container's frames never depend on another container), so the
  * drained append-mode output must equal the batch relation row for
  * row — certified by sharing the batch oracle VERBATIM.
  * FrameStreamSpec pins the cross-batch MemoryStream case.
  *
  * 100 TB: a video-ingest fleet is exactly this — per-row codec work
  * fused onto arrival, the frame explode inheriting scan partitioning,
  * no shuffle, no state; maxFilesPerTrigger is the backpressure knob. */
object FrameDecodeStream {

  /** Weakly session-keyed — see [[graft.SessionMemo]]. */
  private val ran = new graft.SessionMemo[Unit]

  def frameSamplesStreamed(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + Integer.toHexString(dir.hashCode)
    val out = s"/root/repo/target/graft-events/$tag/frame_decode"
    synchronized {
      if (!ran.contains(s, dir)) {
        val fileSchema = s.read.parquet(s"$dir/documents.parquet").schema
        val docStream = s.readStream.schema(fileSchema)
          .option("pathGlobFilter", "documents.parquet")
          .parquet(dir)
        val decoded = Multimodal.frameRowsOf(
          Multimodal.videoBlobsOf(docStream))
        val outPath = new org.apache.hadoop.fs.Path(out)
        outPath.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(outPath, true)
        val q = decoded.toDF().writeStream
          .outputMode("append") // stateless decode: pure per-row append
          .option("checkpointLocation", s"$out/_checkpoint")
          .option("path", s"$out/result")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet")
          .start()
        q.awaitTermination()
        ran.put(s, dir, ())
      }
    }
    s.read.parquet(s"$out/result")
      .orderBy(col("media_id"), col("frame_idx"))
  }
}
