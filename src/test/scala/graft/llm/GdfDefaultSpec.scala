package org.apache.spark.sql.graft.dsv2

import java.io.File
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.SparkSpec

/** Pins DEFAULT COLUMN VALUES (r18, the Iceberg-v3 initial-default /
  * SQL ADD COLUMN ... DEFAULT shape): the metadata-only commit, default
  * serving in the main read, materialization on rewrite, the change
  * feed's old side, time travel to the narrow schema, and the loud
  * failure modes. */
class GdfDefaultSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = s"/tmp/graft-def-spec-${System.nanoTime()}"

  private def plant(p: String): Unit =
    (0L until 40L).map(i => (i, 10L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)

  private def md5(f: File): String =
    MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString

  test("metadata-only commit; old rows serve the default, new rows real values") {
    val p = freshDir()
    plant(p) // v1
    val before = GdfManifest.read(p).files.map(f =>
      f.name -> md5(new File(p, f.name))).toMap
    GdfMaintenance.addColumn(p, "quality", LongType, Some("7")) // v2
    GdfMaintenance.addColumn(p, "note", StringType, Some("unset")) // v3
    val m = GdfManifest.read(p)
    assert(m.files.map(f => f.name -> md5(new File(p, f.name))).toMap
      == before, "ADD COLUMN must touch no data file")
    // v4: rows carrying real values
    Seq((100L, 1L, 9L, "fresh")).toDF("doc_id", "val", "quality", "note")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4").mode("append").save(p)
    val rows = spark.read.format("graftdocs").load(p)
      .select("doc_id", "quality", "note").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(rows(0L) == ((7L, "unset")), s"old row must serve defaults: $rows")
    assert(rows(100L) == ((9L, "fresh")))
    assert(rows.size == 41)
  }

  test("a CoW rewrite materializes the default; the feed's old side serves it") {
    val p = freshDir()
    plant(p) // v1
    GdfMaintenance.addColumn(p, "quality", LongType, Some("7")) // v2
    // v3: CoW-delete doc_id 1 — its file (bucket 1) rewrites at the
    // evolved schema, materializing quality=7 for the surviving rows
    GdfMaintenance.deleteWhere(spark, p,
      Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.EqualTo("doc_id", 1L)))
    val vals = spark.read.format("graftdocs").load(p)
      .where(col("doc_id") === 5L).select("quality").collect()
    assert(vals.map(_.getLong(0)).toSeq == Seq(7L),
      "rewritten file must serve the materialized default")
    // the feed's delete row (pre-evolution image) fills the default too
    val feed = GdfMaintenance.changes(spark, p, 2, 3)
      .select("doc_id", "_change_type", "quality").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(feed.contains((1L, "delete", 7L)), s"got ${feed.toSeq}")
  }

  test("time travel before the evolution serves the narrow schema") {
    val p = freshDir()
    plant(p) // v1
    GdfMaintenance.addColumn(p, "quality", LongType, Some("7")) // v2
    val narrow = spark.read.format("graftdocs")
      .option("version", "1").load(p)
    assert(!narrow.columns.contains("quality"),
      "the pre-evolution snapshot must not grow the column")
  }

  test("no default declared: the evolved column null-fills (r17 behavior)") {
    val p = freshDir()
    plant(p)
    GdfMaintenance.addColumn(p, "extra", LongType, None)
    val r = spark.read.format("graftdocs").load(p)
      .where(col("doc_id") === 0L).select("extra").collect().head
    assert(r.isNullAt(0))
  }

  test("loud failures: duplicate column, unsupported type, bad default") {
    val p = freshDir()
    plant(p)
    val e1 = intercept[IllegalArgumentException] {
      GdfMaintenance.addColumn(p, "val", LongType, None)
    }
    assert(e1.getMessage.contains("already exists"))
    val e2 = intercept[IllegalArgumentException] {
      GdfMaintenance.addColumn(p, "score", DoubleType, None)
    }
    assert(e2.getMessage.contains("supports long/int/string"))
    intercept[NumberFormatException] {
      GdfMaintenance.addColumn(p, "qual", LongType, Some("not-a-number"))
    }
    // nothing committed by the failures
    assert(GdfManifest.read(p).schema.fieldNames.toSeq
      == Seq("doc_id", "val", "bucket"))
  }
}
