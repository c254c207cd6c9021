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
    // three append slices under the HASH invariant (bucket = pmod(id, 8),
    // writer-validated since r18): slices A and B fragment buckets 0..5
    // into two files each; slice C holds ids 7 and 15 — both bucket 7 —
    // so bucket 7 stays a SINGLE file across the history
    def df(rows: Seq[(Long, Long)]) =
      rows.toDF("doc_id", "val")
        .withColumn("bucket", pmod(col("doc_id"), lit(8L)).cast("int"))
    df((0L until 6L).map(i => (i, 10L * i)))
      .write.format("graftdocs").option("buckets", "8")
      .mode("overwrite").save(p)
    df((8L until 14L).map(i => (i, 10L * i)))
      .write.format("graftdocs").option("buckets", "8")
      .mode("append").save(p)
    df(Seq((7L, 70L), (15L, 150L)))
      .write.format("graftdocs").option("buckets", "8")
      .mode("append").save(p)
    val before = liveFiles(p)
    assert(before.size == 13, s"expected 6*2+1 files, got ${before.keySet}")
    val pre = spark.read.format("graftdocs").load(p)
      .select(col("doc_id"), col("val")).orderBy(col("doc_id")).collect()

    GdfMaintenance.compact(spark, p)
    val after = liveFiles(p)
    assert(after.size == 7, s"expected 7 files post-compaction: ${after.keySet}")
    // the single-file bucket is byte-identical and keeps its name
    val singles = before.filter(_._1.startsWith("part-7-"))
    assert(singles.nonEmpty && singles.forall { case (n, d) =>
      after.get(n).contains(d) }, "single-file bucket must not rewrite")
    // content unchanged
    val post = spark.read.format("graftdocs").load(p)
      .select(col("doc_id"), col("val")).orderBy(col("doc_id")).collect()
    assert(pre.sameElements(post), "compaction changed content")
    // the pre-compaction layout still serves through time travel
    val v3 = spark.read.format("graftdocs").option("version", "3").load(p)
    assert(v3.count() == 14L)
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
