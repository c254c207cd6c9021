package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** The corpus materialized through the custom `graftdocs` DataSourceV2
  * connector ([[org.apache.spark.sql.graft.dsv2.GraftDocsSource]]): a
  * per-(session, sf) index-artifact build (the [[graft.SessionMemo]]
  * discipline) that writes the documents table hash-bucketed by
  * `pmod(doc_id, Buckets)` — the connector's write path plans the
  * cluster-by-bucket exchange and doc_id sort itself via
  * RequiresDistributionAndOrdering — and serves reads through the
  * connector's pruning/pushdown/reported-partitioning scan. The
  * `dsv2_text_stats` graded entry consumes [[docs]] with the SAME
  * arithmetic and oracle as text_stats, so a green entry certifies the
  * whole connector round-trip bit-for-bit. */
object DocsDsv2 {

  /** Bucket count: small enough that the sf0.01 corpus still puts
    * dozens of rows per file, large enough to exercise real pruning. */
  val Buckets = 8

  /** Weakly session-keyed — see [[graft.SessionMemo]]. */
  private val built = new graft.SessionMemo[String]

  /** Write-once per (session, sf); returns the table path. */
  def path(s: SparkSession, dir: String): String =
    built.getOrElseUpdate(s, dir) {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_") +
        "_" + Integer.toHexString(dir.hashCode)
      val p = s"/root/repo/target/graft-dsv2/$tag"
      s.read.parquet(s"$dir/documents.parquet")
        .withColumn("bucket",
          pmod(col("doc_id"), lit(Buckets.toLong)).cast(IntegerType))
        .write.format("graftdocs")
        .option("buckets", Buckets.toString)
        .mode("overwrite")
        .save(p)
      p
    }

  /** The corpus read THROUGH the connector (schema = documents + the
    * bucket layout column, which consumers prune away). */
  def docs(s: SparkSession, dir: String): DataFrame =
    s.read.format("graftdocs").load(path(s, dir))

  /** Files per micro-batch for [[statsStreamed]] — 8 bucket files at 3
    * per trigger exercise a genuine multi-batch drain. */
  val StreamMaxFilesPerTrigger = 3

  /** Weakly session-keyed — see [[graft.SessionMemo]]. */
  private val streamed = new graft.SessionMemo[Unit]

  /** The corpus STREAMED through the connector's MicroBatchStream
    * ([[org.apache.spark.sql.graft.dsv2]] `GdfMicroBatchStream`): bucket
    * files are the append log, `maxfilespertrigger` paces admission, and
    * a `Trigger.AvailableNow` drain snapshots the manifest once — the
    * connector's streaming face certified end to end. The per-row stats
    * projection is the SHARED [[TextAnalysis.statsSelect]], and every
    * file is consumed exactly once across batches, so the appended union
    * equals the batch read bit-for-bit and the entry shares text_stats'
    * oracle VERBATIM. */
  def statsStreamed(s: SparkSession, dir: String): DataFrame = {
    val p = path(s, dir)
    val out = s"$p-stream-stats"
    synchronized {
      if (!streamed.contains(s, dir)) {
        val outPath = new org.apache.hadoop.fs.Path(out)
        outPath.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(outPath, true)
        val docStream = s.readStream.format("graftdocs")
          .option("maxfilespertrigger", StreamMaxFilesPerTrigger.toString)
          .load(p)
        val q = TextAnalysis.statsSelect(docStream).writeStream
          .outputMode("append")
          .option("checkpointLocation", s"$out/_checkpoint")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.mode("append").parquet(s"$out/result")
          }
          .start()
        q.awaitTermination()
        streamed.put(s, dir, ())
      }
    }
    s.read.parquet(s"$out/result").orderBy(col("doc_id"))
  }
}
