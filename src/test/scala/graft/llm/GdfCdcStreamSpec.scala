package org.apache.spark.sql.graft.dsv2

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, In}

import graft.SparkSpec

/** Pins the STREAMING CDC SOURCE (r18, `graftdocs-cdc`): offsets are
  * snapshot versions, one commit window per micro-batch, checkpointed
  * resume, and the startingversion replay contract. */
class GdfCdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = s"/tmp/graft-cdcs-spec-${System.nanoTime()}"

  private def plant(p: String): Unit =
    (0L until 40L).map(i => (i, 10L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)

  /** Drain the CDC stream AvailableNow; returns per-batch row seqs. */
  private def drain(p: String, checkpoint: String,
      startingVersion: Option[Int]): Seq[Seq[(Long, String, Int)]] = {
    val batches = new ConcurrentLinkedQueue[Seq[(Long, String, Int)]]()
    val reader = spark.readStream.format("graftdocs-cdc")
    val q = startingVersion.fold(reader)(v =>
        reader.option("startingversion", v.toString))
      .load(p)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.select(col("doc_id"), col("_change_type"),
          col("_commit_version"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
          .toSeq
        if (rows.nonEmpty) batches.add(rows): Unit
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    batches.asScala.toSeq
  }

  test("replay from v1 serves one commit window per micro-batch") {
    val p = freshDir()
    plant(p) // v1
    GdfMaintenance.deleteWhereMor(spark, p,
      Array[Filter](In("doc_id", Array[Any](5L)))) // v2
    GdfMaintenance.deleteByKeys(p, Seq(9L)) // v3
    val batches = drain(p, s"$p-ckpt", Some(1))
    assert(batches.size == 2,
      s"two commit windows -> two micro-batches, got ${batches.size}")
    assert(batches(0).toSet == Set((5L, "delete", 2)))
    assert(batches(1).toSet == Set((9L, "delete", 3)))
  }

  test("startingversion accepts a TAG name: the feed starts at the ref") {
    val p = freshDir()
    plant(p) // v1
    GdfMaintenance.createTag(p, "release", 1) // v2 (metadata commit)
    GdfMaintenance.deleteByKeys(p, Seq(11L)) // v3
    val batches = new ConcurrentLinkedQueue[Seq[(Long, String, Int)]]()
    val q = spark.readStream.format("graftdocs-cdc")
      .option("startingversion", "release")
      .load(p)
      .writeStream
      .option("checkpointLocation", s"$p-tag-ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.select(col("doc_id"), col("_change_type"),
          col("_commit_version"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
          .toSeq
        if (rows.nonEmpty) batches.add(rows): Unit
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(batches.asScala.flatten.toSet == Set((11L, "delete", 3)),
      "everything after the tagged snapshot must stream, nothing before")
  }

  test("default start = current version: only NEW commits stream") {
    val p = freshDir()
    plant(p) // v1
    val ckpt = s"$p-ckpt"
    assert(drain(p, ckpt, None).isEmpty, "nothing to serve at start")
    GdfMaintenance.deleteByKeys(p, Seq(7L)) // v2 arrives
    val batches = drain(p, ckpt, None) // resumes from the checkpoint
    assert(batches.flatten.toSet == Set((7L, "delete", 2)))
    // a third drain re-emits NOTHING (checkpointed exactly-once)
    assert(drain(p, ckpt, None).isEmpty)
  }
}
