package graft.llm

import java.io.File
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the connector's SCHEMA EVOLUTION (r17): an append may WIDEN the
  * table schema; old data files are NOT rewritten (byte-identity
  * pinned) and read with nulls for the added column; a time travel to
  * the pre-evolution snapshot reads the NARROW schema; a type change is
  * rejected at commit. Plus the GDF2 nullable round-trip the evolution
  * machinery rides on. */
class GdfEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = s"/tmp/graft-evo-spec-${System.nanoTime()}"

  private def md5(f: File): String =
    MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString

  private def narrowV1(p: String): Map[String, String] = {
    (0L until 20L by 2L).map(i => (i, 10L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)
    new File(p).listFiles().filter(_.getName.endsWith(".gdf"))
      .map(f => f.getName -> md5(f)).toMap
  }

  private def readT(p: String) = spark.read.format("graftdocs").load(p)

  test("append widens the schema; old files read with nulls, untouched") {
    val p = freshDir()
    val v1Files = narrowV1(p)
    (1L until 20L by 2L).map(i => (i, 10L * i, s"g${i % 3}"))
      .toDF("doc_id", "val", "tag")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("append").save(p)
    // current schema is the union, old columns first
    val t = readT(p)
    assert(t.columns.toSeq == Seq("doc_id", "val", "bucket", "tag"))
    // every v1 file byte-identical — add-a-column rewrote NOTHING
    v1Files.foreach { case (n, d) =>
      assert(md5(new File(p, n)) == d, s"$n was rewritten by the append") }
    // old rows read tag = null; new rows carry it
    val rows = t.select(col("doc_id"), col("tag")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows.size == 20)
    assert((0L until 20L by 2L).forall(rows(_).isEmpty), "v1 rows must null-fill")
    assert((1L until 20L by 2L).forall(i => rows(i).contains(s"g${i % 3}")))
  }

  test("a NON-NULLABLE incoming long column still null-fills old rows") {
    // regression (r18): the widened field must be forced nullable —
    // with the writer's nullable=false carried into the manifest, the
    // codegen fast path read old rows' nulls as 0
    val p = freshDir()
    (0L until 8L).map(i => (i, i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)
    // toDF of Long yields nullable=false fields — the hazard case
    Seq((100L, 1L, 7L)).toDF("doc_id", "val", "extra")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("append").save(p)
    assert(spark.read.format("graftdocs").load(p).schema("extra").nullable,
      "the widened field must be forced nullable")
    val rows = spark.read.format("graftdocs").load(p)
      .select("doc_id", "extra").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(0L).isEmpty, s"old row must read NULL, got ${rows(0L)}")
    assert(rows(100L).contains(7L))
  }

  test("time travel to the pre-evolution snapshot reads the narrow schema") {
    val p = freshDir()
    narrowV1(p)
    (1L until 4L by 2L).map(i => (i, i, "x")).toDF("doc_id", "val", "tag")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("append").save(p)
    val v1 = spark.read.format("graftdocs").option("version", "1").load(p)
    assert(v1.columns.toSeq == Seq("doc_id", "val", "bucket"),
      "the pinned snapshot must serve its own (narrow) schema")
    assert(v1.count() == 10L)
  }

  test("a type change is rejected at commit") {
    val p = freshDir()
    narrowV1(p)
    val bad = Seq((100L, "not-a-long")).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
    val e = intercept[Exception] {
      bad.write.format("graftdocs").option("buckets", "4")
        .mode("append").save(p)
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c => Option(c.getMessage)
        .exists(_.contains("schema evolution"))),
      s"wrong failure: $e")
  }

  test("GDF2 nullable round-trip: nulls in long and string columns") {
    val p = freshDir()
    Seq[(Long, Option[Long], Option[String])](
      (0L, Some(1L), Some("a")), (1L, None, Some("b")),
      (2L, Some(3L), None), (3L, None, None))
      .toDF("doc_id", "val", "tag")
      .withColumn("bucket", pmod(col("doc_id"), lit(2L)).cast("int"))
      .write.format("graftdocs").option("buckets", "2")
      .mode("overwrite").save(p)
    val got = readT(p).select(col("doc_id"), col("val"), col("tag"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        Option(r.getString(2)))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, Some(1L), Some("a")), (1L, None, Some("b")),
      (2L, Some(3L), None), (3L, None, None)))
    // a null key column still fails loudly
    val e = intercept[Exception] {
      Seq[(Option[Long], Long)]((None, 1L)).toDF("doc_id", "val")
        .withColumn("bucket", lit(0).cast("int"))
        .write.format("graftdocs").option("buckets", "2")
        .mode("overwrite").save(s"$p-bad")
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("must be non-null"))), s"wrong failure: $e")
  }
}
