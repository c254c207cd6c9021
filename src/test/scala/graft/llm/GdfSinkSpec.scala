package graft.llm

import java.io.File

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.SupportsWrite
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, PhysicalWriteInfo}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Pins the connector's STREAMING SINK face (r17): per-epoch append
  * snapshots through the public StreamingWrite contract, the manifest's
  * epoch ledger, and the exactly-once replay guarantee — a re-committed
  * epoch is a no-op that must NOT disturb the live file set even though
  * a real replay regenerates the same deterministic file names. */
class GdfSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = s"/tmp/graft-sink-spec-${System.nanoTime()}"

  private def plant(p: String): Unit =
    (0L until 40L).map(i => (i, 10L * i, s"t$i")).toDF("doc_id", "val", "tag")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)

  private def manifestText(p: String): String =
    new String(java.nio.file.Files.readAllBytes(
      new File(p, "manifest.json").toPath))

  test("stream-to-stream: the sink table equals the source, epoch ledger full") {
    val src = freshDir(); plant(src)
    val dst = freshDir()
    val q = spark.readStream.format("graftdocs")
      .option("maxfilespertrigger", "1").load(src)
      .writeStream.format("graftdocs")
      .option("buckets", "4")
      .option("checkpointLocation", s"$dst-ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
    val a = spark.read.format("graftdocs").load(src)
      .select(col("doc_id"), col("val"), col("tag"))
      .orderBy(col("doc_id")).collect()
    val b = spark.read.format("graftdocs").load(dst)
      .select(col("doc_id"), col("val"), col("tag"))
      .orderBy(col("doc_id")).collect()
    assert(a.length == 40 && a.sameElements(b),
      "the streamed copy must equal the source bit for bit")
    // 4 source files at 1/trigger -> 4 epochs in the ledger
    val epochs = "\"epochs\":\\[([^\\]]*)\\]".r
      .findFirstMatchIn(manifestText(dst)).get.group(1)
    assert(epochs.split(",").length == 4, s"epoch ledger wrong: [$epochs]")
  }

  /** Drives the raw StreamingWrite contract (the interfaces Spark itself
    * calls) to force a replayed epoch. */
  test("a replayed epoch is a no-op and never disturbs live files") {
    val p = freshDir()
    val writeSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("val", LongType),
      StructField("tag", StringType), StructField("bucket", IntegerType)))
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", p)
    val src = new org.apache.spark.sql.graft.dsv2.GraftDocsSource()
    val table = src.getTable(new StructType(), Array.empty, opts)
      .asInstanceOf[SupportsWrite]
    val info = new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(opts)
      override def queryId(): String = "gdf-sink-spec"
      override def schema(): StructType = writeSchema
    }
    val sw = table.newWriteBuilder(info).build().toStreaming
    val factory = sw.createStreamingWriterFactory(
      new PhysicalWriteInfo { override def numPartitions(): Int = 1 })

    def writeEpoch(epoch: Long, ids: Seq[Long]) = {
      val w = factory.createWriter(0, 0L, epoch)
      ids.foreach(i => w.write(new GenericInternalRow(
        Array[Any](i, 10L * i, UTF8String.fromString(s"t$i"),
          (i % 4L).toInt)): InternalRow))
      w.commit()
    }

    sw.commit(7L, Array(writeEpoch(7L, Seq(0L, 1L, 2L))))
    val afterFirst = manifestText(p)
    assert(afterFirst.contains("\"epochs\":[7]"))
    assert(spark.read.format("graftdocs").load(p).count() == 3L)

    // the replay: same epoch id, same deterministic file names
    sw.commit(7L, Array(writeEpoch(7L, Seq(0L, 1L, 2L))))
    assert(manifestText(p) == afterFirst, "replay must not commit")
    assert(spark.read.format("graftdocs").load(p).count() == 3L,
      "replay must not lose or duplicate rows")

    // a genuinely new epoch still appends
    sw.commit(8L, Array(writeEpoch(8L, Seq(10L, 11L))))
    assert(manifestText(p).contains("\"epochs\":[7,8]"))
    assert(spark.read.format("graftdocs").load(p).count() == 5L)
  }

  test("a BRANCH sink streams into an audit window; fast-forward lands it (r19)") {
    import org.apache.spark.sql.graft.dsv2.GdfMaintenance
    val src = freshDir(); plant(src)
    val dst = freshDir()
    // seed main with a 4-row base the audit stream must not disturb
    (100L until 104L).map(i => (i, i, s"b$i")).toDF("doc_id", "val", "tag")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(dst)
    val q = spark.readStream.format("graftdocs")
      .option("maxfilespertrigger", "2").load(src)
      .writeStream.format("graftdocs")
      .option("buckets", "4")
      .option("branch", "audit")
      .option("checkpointLocation", s"$dst-br-ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
    // main untouched by the whole drained stream
    assert(spark.read.format("graftdocs").load(dst).count() == 4L,
      "main must serve only the base until fast-forward")
    // the branch holds base + every streamed row, epochs in ITS ledger
    assert(spark.read.format("graftdocs")
      .option("version", "audit").load(dst).count() == 44L)
    // the branch HEAD manifest (highest version tagged branch=audit)
    // carries the epoch ledger — 2 triggers at 2 files each
    val headJson = new File(dst).listFiles()
      .filter(_.getName.matches("manifest-v\\d+\\.json")).toSeq
      .sortBy(f => "\\d+".r.findFirstIn(f.getName).get.toInt)
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
      .filter(_.contains("\"branch\":\"audit\""))
      .last
    val epochs = "\"epochs\":\\[([^\\]]*)\\]".r
      .findFirstMatchIn(headJson).get.group(1)
    assert(epochs.split(",").count(_.nonEmpty) == 2,
      s"branch epoch ledger wrong: [$epochs]")
    GdfMaintenance.fastForward(dst, "audit")
    assert(spark.read.format("graftdocs").load(dst).count() == 44L,
      "fast-forward lands the audited stream on main as one commit")
  }

  test("the graded sink entry equals the batch table") {
    val stats = DocsDsv2.sinkStats(spark, sf001)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(stats.length == 500 && stats.toSet.size == 500,
      "every doc must land exactly once through the sink")
  }
}
