package org.apache.spark.sql.graft.dsv2

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, In}

import graft.SparkSpec

/** Pins the CHANGE DATA FEED (r18) — [[GdfMaintenance.changes]], the
  * Iceberg-changelog / Delta-CDF verb — and the scan's `files` subset
  * option it reads through. Contract under test:
  *
  *  - the feed nets exactly the row-level changes between two snapshots:
  *    deletes (merge-on-read — only a vector changed), update pre/post
  *    image pairs (copy-on-write rewrites), inserts — and NOTHING for
  *    rows a vector or rewrite merely carried along;
  *  - windows compose: changes(1,2) ++ changes(2,3) partitions what
  *    changes(1,3) reports for disjoint key sets;
  *  - the read footprint is the manifest DIFF, not a snapshot scan: the
  *    `files` option restricts the scan to named files, an empty subset
  *    is a valid empty scan, and aggregate pushdown refuses under a
  *    subset (the manifest stats describe the whole snapshot);
  *  - an old side predating schema evolution null-fills the new columns.
  */
class GdfChangesSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = s"/tmp/graft-chg-spec-${System.nanoTime()}"

  private def plant(p: String): Unit =
    (0L until 40L).map(i => (i, 10L * i, s"t$i")).toDF("doc_id", "val", "tag")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)

  /** v1 = the 40-doc plant; v2 = MoR delete of {7, 11} (bucket 3, dv
    * only); v3 = merge updating doc 2 (bucket 2 CoW rewrite) + inserting
    * docs 100, 101. */
  private def history(): String = {
    val p = freshDir()
    plant(p)
    GdfMaintenance.deleteWhereMor(spark, p,
      Array[Filter](In("doc_id", Array[Any](7L, 11L))))
    val src = Seq((2L, 999L, "upd"), (100L, 1000L, "ins"), (101L, 1010L, "ins"))
      .toDF("doc_id", "val", "tag")
    GdfMaintenance.mergeInto(spark, p, src)
    p
  }

  test("feed nets deletes, update images, inserts; carried rows net out") {
    val p = history()
    val got = GdfMaintenance.changes(spark, p, 1, 3)
      .orderBy(col("doc_id"), col("_change_type"))
      .as[(Long, Long, String, String)].collect().toSeq
    val want = Seq(
      // 'update_postimage' < 'update_preimage' in the feed's total order
      (2L, 999L, "upd", "update_postimage"),
      (2L, 20L, "t2", "update_preimage"),
      (7L, 70L, "t7", "delete"),
      (11L, 110L, "t11", "delete"),
      (100L, 1000L, "ins", "insert"),
      (101L, 1010L, "ins", "insert"))
    assert(got == want, s"feed mismatch:\n${got.mkString("\n")}")
  }

  test("windows compose: (1,2) is the delete, (2,3) is the merge") {
    val p = history()
    val w12 = GdfMaintenance.changes(spark, p, 1, 2)
      .select(col("doc_id"), col("_change_type"))
      .as[(Long, String)].collect().toSet
    assert(w12 == Set((7L, "delete"), (11L, "delete")))
    val w23 = GdfMaintenance.changes(spark, p, 2, 3)
      .select(col("doc_id"), col("_change_type"))
      .as[(Long, String)].collect().toSet
    assert(w23 == Set((2L, "update_preimage"), (2L, "update_postimage"),
      (100L, "insert"), (101L, "insert")))
  }

  test("the per-commit changelog tags each transition's changes") {
    val p = history()
    val got = GdfMaintenance.changesLog(spark, p)
      .select(col("doc_id"), col("_change_type"), col("_commit_version"))
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set(
      (7L, "delete", 2), (11L, "delete", 2),
      (2L, "update_preimage", 3), (2L, "update_postimage", 3),
      (100L, "insert", 3), (101L, "insert", 3)))
    val e = intercept[IllegalArgumentException] {
      val single = s"/tmp/graft-chg-single-${System.nanoTime()}"
      plant(single)
      GdfMaintenance.changesLog(spark, single)
    }
    assert(e.getMessage.contains("two retained snapshots"))
  }

  test("files option restricts the scan; empty subset is a valid empty scan") {
    val p = freshDir()
    plant(p)
    val m = GdfManifest.read(p)
    val one = m.files.find(_.bucket == 1).get
    val got = spark.read.format("graftdocs")
      .option("files", one.name).load(p)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got == (0L until 40L).filter(_ % 4 == 1).toSet,
      "files subset must serve exactly the named file's rows")
    assert(spark.read.format("graftdocs")
      .option("files", "").load(p).count() == 0L)
    // aggregate pushdown refuses under a subset: a count over a named
    // file must be the REAL count of that file, not the manifest total
    val n = spark.read.format("graftdocs")
      .option("files", one.name).load(p).agg(count(lit(1))).head().getLong(0)
    assert(n == 10L, s"subset count must ignore manifest-wide stats, got $n")
  }

  test("feed reads only the manifest-diffed files (footprint pin)") {
    val p = history()
    // truncate every file both manifests share UNCHANGED (same name,
    // same dv): the feed must not open them — buckets 0 and 1 were
    // never touched by the delete (bucket 3) or the merge (bucket 2 +
    // insert files), so their files are shared verbatim
    val v1 = GdfManifest.readVersion(p, 1).files.map(f => f.name -> f).toMap
    val v3 = GdfManifest.readVersion(p, 3).files
    val shared = v3.filter(f => v1.get(f.name).exists(_.dv == f.dv))
    assert(shared.nonEmpty, "fixture must carry files over verbatim")
    shared.foreach(f =>
      new java.io.FileOutputStream(new java.io.File(p, f.name)).close())
    val got = GdfMaintenance.changes(spark, p, 1, 3).count()
    assert(got == 6L,
      "the feed must succeed with every carried-over file truncated " +
        "(it may only open the manifest-diffed files)")
  }

  test("old side predating schema evolution null-fills the new column") {
    val p = freshDir()
    (0L until 8L).map(i => (i, 10L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p) // v1: narrow (doc_id, val)
    (8L until 12L).map(i => (i, 10L * i, s"t$i")).toDF("doc_id", "val", "tag")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("append").save(p) // v2: widened (+tag), old files untouched
    val got = GdfMaintenance.changes(spark, p, 1, 2)
      .orderBy(col("doc_id"))
      .as[(Long, Long, String, String)].collect().toSeq
    val want = (8L until 12L).map(i => (i, 10L * i, s"t$i", "insert"))
    assert(got == want, s"evolution feed mismatch:\n${got.mkString("\n")}")
  }
}
