package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted partition-wise.
  *
  * The decode itself is a ===== STUB ===== (this container has no
  * image/audio codecs): [[DecodeStub.decode]] derives deterministic fake
  * dimensions/frame counts from the byte stream. Everything AROUND the stub
  * is the real Spark shape a 100 TB media pipeline needs:
  *  - an explicit typed schema ([[MediaBlob]] → [[MediaFeatures]]) with
  *    case-class Encoders (binary payload + metadata columns);
  *  - `mapPartitions` batch execution — one decoder instance per partition,
  *    streaming over rows (exactly the batch shape of `mapInPandas` /
  *    Arrow-batched Python decode, expressed Scala-native);
  *  - per-row work only — no shuffle, no driver collection; partitioning
  *    is inherited from the source scan, so it scales with input splits.
  *
  * Because the stub is a pure function of the bytes, the whole pipeline is
  * oracle-checkable in SQL (byte length + md5 + arithmetic).
  */
object Multimodal {

  final case class MediaBlob(media_id: Long, blob: Array[Byte], kind: String)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      digest: String,
      width: Long,
      height: Long,
      n_frames: Long)

  object DecodeStub {
    /** ===== STUB ===== deterministic fake decode: real codecs would parse
      * the container header here. Fake dimensions are pure functions of the
      * payload so results stay verifiable. */
    def decode(b: MediaBlob): MediaFeatures = {
      val n = b.blob.length.toLong
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(b.blob).map("%02x".format(_)).mkString
      MediaFeatures(
        media_id = b.media_id,
        kind = b.kind,
        n_bytes = n,
        digest = digest,
        width = 320 + n % 320,
        height = 240 + (n * 7) % 240,
        n_frames = 1 + n % 30)
    }
  }

  /** The documents table doubles as the media corpus: its text bytes are the
    * opaque payload (in production: image/audio/video bytes from parquet
    * binary columns), `source` is the media kind. */
  def blobs(s: SparkSession, dir: String): Dataset[MediaBlob] = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("blob"),
        col("source").as("kind"))
      .as[MediaBlob]
  }

  /** Partition-wise decode + feature extraction. */
  def features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    blobs(s, dir)
      .mapPartitions { rows =>
        // one decoder context per partition (where a codec would init once)
        rows.map(DecodeStub.decode)
      }
      .toDF()
      .orderBy(col("media_id"))
  }

  /** Target box for [[resized]] (the ViT-style square input). */
  val ResizeBox = 224L

  /** Resize plumbing: aspect-preserving fit of each media item into the
    * [[ResizeBox]] square — the longest side maps to the box, the short
    * side scales by floor(short·box/long) (pure integer arithmetic, so the
    * oracle compare is exact). The resized "content" hash is the
    * ===== STUB ===== stand-in for the actual pixel resample; the real
    * plumbing is the per-row metadata math fused onto the decode pass —
    * no shuffle, partitioning inherited from the scan. */
  def resized(s: SparkSession, dir: String): DataFrame = {
    val long = greatest(col("width"), col("height"))
    val short = least(col("width"), col("height"))
    val shortOut = floor(short * ResizeBox / long).cast("long")
    features(s, dir)
      .select(col("media_id"), col("width"), col("height"),
        when(col("width") >= col("height"), lit(ResizeBox)).otherwise(shortOut)
          .as("out_width"),
        when(col("width") >= col("height"), shortOut).otherwise(lit(ResizeBox))
          .as("out_height"))
      .withColumn("resized_hash",
        md5(concat_ws("|", col("media_id"), col("out_width"), col("out_height"))))
      .orderBy(col("media_id"))
  }

  /** Frame sampling: explode each media item into evenly-strided frame
    * rows (stride = max(1, n_frames/4) → ≤5 samples per item). The frame
    * "content" hash is the ===== STUB ===== stand-in for decoding the
    * frame; the explode-into-rows shape (one row per sampled frame,
    * partitioning inherited, no shuffle) is the real 100 TB pipeline
    * plumbing a video corpus needs. */
  def frameSamples(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val stride = greatest(lit(1L), floor(col("n_frames") / 4).cast(LongType))
    features(s, dir)
      .select(col("media_id"), col("digest"), col("n_frames"), stride.as("stride"))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1, col("stride"))))
      .select(col("media_id"), col("frame_idx"),
        md5(concat(col("digest"), lit("|"), col("frame_idx").cast("string")))
          .as("frame_hash"))
      .orderBy(col("media_id"), col("frame_idx"))
  }
}
