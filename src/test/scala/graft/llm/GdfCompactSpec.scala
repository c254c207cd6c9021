package graft.llm

import java.io.File
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.dsv2.GdfMaintenance

import graft.SparkSpec

/** Pins the compaction verb (r17, [[GdfMaintenance.compact]]): every
  * fragmented bucket collapses to ONE doc_id-sorted file, single-file
  * buckets carry over byte-identical, content is unchanged, and the
  * pre-compaction layout stays time-travelable. */
class GdfCompactSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = s"/tmp/graft-compact-spec-${System.nanoTime()}"

  private def md5(f: File): String =
    MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString

  private def liveFiles(p: String): Map[String, String] = {
    val manifest = new String(java.nio.file.Files.readAllBytes(
      new File(p, "manifest.json").toPath))
    "\"name\":\"([^\"]+\\.gdf)\"".r.findAllMatchIn(manifest).map(_.group(1))
      .map(n => n -> md5(new File(p, n))).toMap
  }

  test("compaction collapses fragmented buckets, preserves content exactly") {
    val p = freshDir()
    // 3 slices over 4 buckets -> 3 files per bucket; bucket 9 (ids ≡ 1
    // mod 4 only in slice 1? no — keep one SINGLE-file bucket by giving
    // ids 100..103 (bucket 0..3) only in slice 0 for a 5th bucket: use a
    // dedicated single-slice bucket value 7 via explicit bucket column
    def df(rows: Seq[(Long, Long)], b: Option[Int] = None) =
      rows.toDF("doc_id", "val")
        .withColumn("bucket", b.map(lit(_)).getOrElse(
          pmod(col("doc_id"), lit(4L)).cast("int")).cast("int"))
    df((0L until 12L).map(i => (i, 10L * i)))
      .write.format("graftdocs").option("buckets", "8")
      .mode("overwrite").save(p)
    df((12L until 24L).map(i => (i, 10L * i)))
      .write.format("graftdocs").option("buckets", "8")
      .mode("append").save(p)
    // the single-file bucket: one append into bucket 7 only
    df(Seq((100L, 1L), (101L, 2L)), Some(7))
      .write.format("graftdocs").option("buckets", "8")
      .mode("append").save(p)
    val before = liveFiles(p)
    assert(before.size == 9, s"expected 4*2+1 files, got ${before.keySet}")
    val pre = spark.read.format("graftdocs").load(p)
      .select(col("doc_id"), col("val")).orderBy(col("doc_id")).collect()

    GdfMaintenance.compact(spark, p)
    val after = liveFiles(p)
    assert(after.size == 5, s"expected 5 files post-compaction: ${after.keySet}")
    // the single-file bucket is byte-identical and keeps its name
    val singles = before.filter(_._1.startsWith("part-7-"))
    assert(singles.forall { case (n, d) => after.get(n).contains(d) },
      "single-file bucket must not rewrite")
    // content unchanged
    val post = spark.read.format("graftdocs").load(p)
      .select(col("doc_id"), col("val")).orderBy(col("doc_id")).collect()
    assert(pre.sameElements(post), "compaction changed content")
    // the pre-compaction layout still serves through time travel
    val v3 = spark.read.format("graftdocs").option("version", "3").load(p)
    assert(v3.count() == 26L)
  }

  test("compacting an already-compact table is a layout no-op commit") {
    val p = freshDir()
    (0L until 8L).map(i => (i, i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)
    val before = liveFiles(p)
    GdfMaintenance.compact(spark, p)
    assert(liveFiles(p) == before, "no fragmented bucket, no rewrite")
  }
}
