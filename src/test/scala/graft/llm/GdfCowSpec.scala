package graft.llm

import java.io.File
import java.security.MessageDigest

import org.apache.spark.sql.connector.catalog.SupportsDelete
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.dsv2.GdfMaintenance
import org.apache.spark.sql.sources.{EqualTo, Filter, In, StringStartsWith}

import graft.SparkSpec

/** Pins the connector's COPY-ON-WRITE verbs (r17): row-level DELETE via
  * Spark's `SupportsDelete` and keyed MERGE via [[GdfMaintenance]].
  * The contract under test: ONLY files whose zone maps / bucket pins can
  * hold an affected row are rewritten — every other file is BYTE-
  * IDENTICAL after the commit and its manifest stats carry over — and
  * the pre-change snapshot still serves through time travel (the
  * GDPR-delete-with-audit shape). */
class GdfCowSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = s"/tmp/graft-cow-spec-${System.nanoTime()}"

  // 40 docs over 4 hash buckets: id 0..39, val = 10·id, tag = t<id>
  private def plant(p: String): Unit =
    (0L until 40L).map(i => (i, 10L * i, s"t$i")).toDF("doc_id", "val", "tag")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)

  /** The table through the PUBLIC provider API, as a SupportsDelete. */
  private def deletable(p: String): SupportsDelete = {
    val src = new org.apache.spark.sql.graft.dsv2.GraftDocsSource()
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", p)
    val schema = src.inferSchema(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
    src.getTable(schema, Array.empty, opts).asInstanceOf[SupportsDelete]
  }

  private def md5(f: File): String =
    MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString

  /** name → digest for every data file the CURRENT manifest references. */
  private def liveDigests(p: String): Map[String, String] = {
    val manifest = new String(java.nio.file.Files.readAllBytes(
      new File(p, "manifest.json").toPath))
    "\"name\":\"([^\"]+\\.gdf)\"".r.findAllMatchIn(manifest).map(_.group(1))
      .map(n => n -> md5(new File(p, n))).toMap
  }

  private def readT(p: String) = spark.read.format("graftdocs").load(p)
  private def readV(p: String, v: Int) =
    spark.read.format("graftdocs").option("version", v.toString).load(p)

  test("delete CoW: only the hit bucket's file rewrites, rows vanish") {
    val p = freshDir(); plant(p)
    val before = liveDigests(p)
    assert(before.size == 4)
    // every requested id ≡ 1 (mod 4) → all live in bucket 1
    val ids: Array[Any] = Array(1L, 5L, 9L, 13L, 37L)
    deletable(p).deleteWhere(Array[Filter](In("doc_id", ids)))
    val after = liveDigests(p)
    // untouched buckets: SAME file names, SAME bytes
    val untouchedBefore = before.filterNot(_._1.startsWith("part-1-"))
    val untouchedAfter = after.filterNot(_._1.startsWith("part-1-"))
    assert(untouchedAfter == untouchedBefore,
      s"untouched files changed: $untouchedBefore -> $untouchedAfter")
    // the hit bucket rewrote into a NEW file
    val hit = after.keys.filter(_.startsWith("part-1-")).toSeq
    assert(hit.size == 1 && !before.contains(hit.head),
      s"bucket 1 should have exactly one new file, got $hit")
    // rows: requested ids gone, everything else intact (incl. bucket 1's
    // survivors), and the pre-delete snapshot still serves them
    val cur = readT(p).select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(cur == (0L until 40L).toSet -- ids.map(_.asInstanceOf[Long]))
    assert(readV(p, 1).count() == 40L, "v1 must still serve deleted rows")
  }

  test("delete by EqualTo pins a single file; predicate language is gated") {
    val p = freshDir(); plant(p)
    val before = liveDigests(p)
    val t = deletable(p)
    assert(t.canDeleteWhere(Array[Filter](EqualTo("doc_id", 6L))))
    assert(!t.canDeleteWhere(Array[Filter](StringStartsWith("tag", "t"))))
    assertThrows[Exception](
      t.deleteWhere(Array[Filter](StringStartsWith("tag", "t"))))
    t.deleteWhere(Array[Filter](EqualTo("doc_id", 6L)))
    val after = liveDigests(p)
    assert(after.filterNot(_._1.startsWith("part-2-")) ==
      before.filterNot(_._1.startsWith("part-2-")))
    assert(readT(p).count() == 39L)
  }

  test("merge CoW: matched files rewrite, inserts append, rest untouched") {
    val p = freshDir(); plant(p)
    val before = liveDigests(p)
    // updates hit ids ≡ 2 (mod 4) → bucket 2 only; inserts are new ids
    val source = Seq(
      (2L, 9999L, "u2"), (6L, 9999L, "u6"),     // matched -> update
      (100L, 1L, "new100"), (101L, 2L, "new101") // unmatched -> insert
    ).toDF("doc_id", "val", "tag")
    GdfMaintenance.mergeInto(spark, p, source)
    val after = liveDigests(p)
    // buckets 1 and 3 completely untouched (bucket 0 receives insert 100,
    // pmod(100,4)=0; bucket 1 receives 101? pmod(101,4)=1 — inserts land
    // as NEW files, the ORIGINAL files still carry over byte-identical)
    val origNames = before.keySet
    assert(origNames.filterNot(_.startsWith("part-2-"))
      .forall(n => after.get(n).contains(before(n))),
      "original non-matched files must carry over byte-identical")
    // bucket 2's original file is out of the live set, replaced
    assert(!after.keySet.exists(n =>
      n.startsWith("part-2-") && origNames.contains(n)))
    // state: updates applied, inserts present, the rest intact
    val rows = readT(p).select(col("doc_id"), col("val"), col("tag"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(rows.size == 42)
    assert(rows(2L) == ((9999L, "u2")) && rows(6L) == ((9999L, "u6")))
    assert(rows(100L) == ((1L, "new100")) && rows(101L) == ((2L, "new101")))
    assert(rows(3L) == ((30L, "t3")))
    // the pre-merge snapshot is intact (audit)
    assert(readV(p, 1).count() == 40L)
    assert(readV(p, 1).where(col("doc_id") === 2L)
      .select(col("val")).collect()(0).getLong(0) == 20L)
  }

  test("delete under the zorder layout prunes by zone maps alone") {
    // range-partitioned cells: file b holds ids 10b..10b+9 with TIGHT
    // doc_id zone maps; layout=zorder disables the pmod bucket pin, so
    // file pruning must come from the id ranges
    val p = freshDir()
    (0L until 40L).map(i => (i, 10L * i, s"t$i")).toDF("doc_id", "val", "tag")
      .withColumn("bucket", (col("doc_id") / 10L).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .option("layout", "zorder")
      .mode("overwrite").save(p)
    val before = liveDigests(p)
    assert(before.size == 4)
    deletable(p).deleteWhere(Array[Filter](
      In("doc_id", Array(21L, 25L, 28L))))
    val after = liveDigests(p)
    assert(after.filterNot(_._1.startsWith("part-2-")) ==
      before.filterNot(_._1.startsWith("part-2-")),
      "only the id-range-matched cell may rewrite")
    assert(!after.keySet.exists(n =>
      n.startsWith("part-2-") && before.contains(n)))
    assert(readT(p).count() == 37L)
  }

  test("delete on an evolved table normalizes the rewritten file's schema") {
    val p = freshDir()
    // v1: narrow (doc_id, val); append: wide (+tag) for other ids
    (0L until 8L).map(i => (i, 10L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(2L)).cast("int"))
      .write.format("graftdocs").option("buckets", "2")
      .mode("overwrite").save(p)
    (8L until 16L).map(i => (i, 10L * i, s"t$i")).toDF("doc_id", "val", "tag")
      .withColumn("bucket", pmod(col("doc_id"), lit(2L)).cast("int"))
      .write.format("graftdocs").option("buckets", "2")
      .mode("append").save(p)
    // id 2 lives in an OLD narrow file; the rewrite lands at the CURRENT
    // wide schema with tag null-filled — and loses no other row
    deletable(p).deleteWhere(Array[Filter](EqualTo("doc_id", 2L)))
    val rows = readT(p).select(col("doc_id"), col("val"), col("tag"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.getString(2))))).toMap
    assert(rows.size == 15 && !rows.contains(2L))
    assert(rows(0L) == ((0L, None)) && rows(4L) == ((40L, None)),
      "old-file survivors must read tag=null after the rewrite")
    assert(rows(9L) == ((90L, Some("t9"))))
  }

  test("merge with no matches is pure insert; no data file rewrites") {
    val p = freshDir(); plant(p)
    val before = liveDigests(p)
    GdfMaintenance.mergeInto(spark, p,
      Seq((200L, 5L, "n")).toDF("doc_id", "val", "tag"))
    val after = liveDigests(p)
    assert(before.forall { case (n, d) => after.get(n).contains(d) },
      "a no-match merge must not rewrite any existing file")
    assert(after.size == before.size + 1)
    assert(readT(p).count() == 41L)
  }
}
