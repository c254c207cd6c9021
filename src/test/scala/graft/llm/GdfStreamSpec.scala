package graft.llm

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Certifies the `graftdocs` connector's MICRO-BATCH STREAM (r14, X80):
  * bucket files as the offset log, `maxfilespertrigger` admission
  * control pacing the drain into multiple batches, AvailableNow
  * snapshotting, and exactly-once file consumption — the streamed union
  * equals the batch read with no duplicates under any pacing. */
class GdfStreamSpec extends SparkSpec {

  private def drain(maxFilesPerTrigger: Int, tag: String): (DataFrame, Int) = {
    val p = DocsDsv2.path(spark, sf001)
    val out = s"$p-spec-stream-$tag"
    val outPath = new org.apache.hadoop.fs.Path(out)
    outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(outPath, true)
    val reader = spark.readStream.format("graftdocs")
    val configured =
      if (maxFilesPerTrigger > 0)
        reader.option("maxfilespertrigger", maxFilesPerTrigger.toString)
      else reader
    val batches = new AtomicInteger(0)
    val q = configured.load(p)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$out/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) batches.incrementAndGet()
        b.write.mode("append").parquet(s"$out/result")
      }
      .start()
    q.awaitTermination()
    (spark.read.parquet(s"$out/result"), batches.get())
  }

  // files of the CURRENT snapshot (one scan partition per file) — a raw
  // .gdf listing would also count RETAINED older snapshots now that
  // every overwrite commits a time-travel version (r16)
  private lazy val nFiles = spark.read.format("graftdocs")
    .load(DocsDsv2.path(spark, sf001)).rdd.getNumPartitions

  test("admission control paces the drain: one file per micro-batch") {
    val (got, batches) = drain(1, "paced")
    assert(nFiles >= 2, s"fixture too small: $nFiles files")
    assert(batches === nFiles,
      s"expected $nFiles single-file batches, got $batches")
    val batch = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id")).collect()
    assert(got.orderBy(col("doc_id")).collect().sameElements(batch))
  }

  test("exactly-once: no doc is consumed twice across batches") {
    val (got, _) = drain(1, "once")
    assert(got.groupBy(col("doc_id")).count()
      .where(col("count") > 1).isEmpty)
  }

  test("no admission limit: the whole table drains in one batch") {
    val (got, batches) = drain(0, "all")
    assert(batches === 1, s"expected one batch, got $batches")
    assert(got.count() ===
      spark.read.parquet(s"$sf001/documents.parquet").count())
  }
}
