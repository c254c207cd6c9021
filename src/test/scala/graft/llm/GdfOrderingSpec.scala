package org.apache.spark.sql.graft.dsv2

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, In}

import graft.SparkSpec

/** Pins the REPORTED PER-PARTITION ORDERING (r18,
  * `SupportsReportOrdering`): every gdf file is doc_id-sorted by the
  * write contract, so single-file buckets (the post-compaction layout)
  * report `doc_id ASC` and a downstream per-partition sort is ELIDED;
  * fragmented buckets (concatenations of sorted runs) report nothing
  * and the sort stays. */
class GdfOrderingSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = s"/tmp/graft-ord-spec-${System.nanoTime()}"

  private def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def sortCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case s: SortExec => s }.size

  private def sortedWithin(df: org.apache.spark.sql.DataFrame): Boolean = {
    import org.apache.spark.sql.Row
    df.select(col("doc_id")).rdd
      .mapPartitions { it =>
        val ids = it.map { case Row(id: Long) => id }.toSeq
        Iterator.single(ids == ids.sorted)
      }.collect().forall(identity)
  }

  test("single-file buckets report doc_id order; the sort is elided") {
    val p = freshDir()
    (0L until 40L).map(i => (i, 10L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)
    withoutAqe {
      val q = spark.read.format("graftdocs").load(p)
        .select(col("doc_id"), col("val"))
        .sortWithinPartitions(col("doc_id"))
      assert(sortCount(q) == 0,
        s"reported ordering must elide the sort:\n${q.queryExecution.executedPlan}")
      assert(sortedWithin(q), "partitions must actually be doc_id-sorted")
    }
  }

  test("overlapping fragments report nothing; compaction restores elision") {
    val p = freshDir()
    val base = (0L until 40L).map(i => (i, 10L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
    // mod-3 slices: every bucket gets files whose doc_id ranges all span
    // the whole corpus — genuinely OVERLAPPING runs, never sorted
    (0L until 3L).foreach { s =>
      base.where(pmod(col("doc_id"), lit(3L)) === s)
        .write.format("graftdocs").option("buckets", "4")
        .mode(if (s == 0L) "overwrite" else "append").save(p)
    }
    withoutAqe {
      def q = spark.read.format("graftdocs").load(p)
        .select(col("doc_id"), col("val"))
        .sortWithinPartitions(col("doc_id"))
      assert(sortCount(q) == 1,
        "overlapping multi-file buckets are not sorted — the sort must stay")
      GdfMaintenance.compact(spark, p)
      assert(sortCount(q) == 0,
        "compaction restores the one-sorted-file layout and the elision")
      assert(sortedWithin(q))
    }
  }

  test("NON-overlapping sorted runs elide without any rewrite (r19)") {
    val p = freshDir()
    val base = (0L until 40L).map(i => (i, 10L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
    // range slices: two files per bucket with DISJOINT doc_id ranges —
    // the reader serves them in (minDocId, name) order, so the
    // concatenation is sorted and the claim is sound with zero rewrites
    Seq(col("doc_id") < 20L, col("doc_id") >= 20L).zipWithIndex.foreach {
      case (slice, i) =>
        base.where(slice)
          .write.format("graftdocs").option("buckets", "4")
          .mode(if (i == 0) "overwrite" else "append").save(p)
    }
    assert(GdfManifest.read(p).files.groupBy(_.bucket)
      .forall(_._2.size == 2), "fixture: two files per bucket")
    withoutAqe {
      val q = spark.read.format("graftdocs").load(p)
        .select(col("doc_id"), col("val"))
        .sortWithinPartitions(col("doc_id"))
      assert(sortCount(q) == 0,
        "disjoint sorted runs must report doc_id order")
      assert(sortedWithin(q), "and the served order must really be sorted")
    }
  }

  test("binpack's multi-file layout keeps the elision (r19)") {
    val p = freshDir()
    // 5 overlapping mod-5 slices of low-compressibility rows, then
    // binpack to ~40% of a bucket → ~2 chunk files per bucket, each a
    // disjoint slice of the merged sorted run
    (0L until 5L).foreach { s =>
      (0L until 200L).filter(_ % 5 == s).map(i => (i,
          (0L until 24L).map(j =>
            ((i * 97L + j) * 2654435761L * (j + 7L)).toHexString)
            .mkString(" ")))
        .toDF("doc_id", "text")
        .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
        .write.format("graftdocs").option("buckets", "4")
        .mode(if (s == 0L) "overwrite" else "append").save(p)
    }
    val bytes = GdfManifest.read(p).files
      .map(f => new java.io.File(p, f.name).length()).sum
    GdfMaintenance.compactBinpack(spark, p, bytes * 2 / (5 * 4))
    val m = GdfManifest.read(p)
    assert(m.files.groupBy(_.bucket).exists(_._2.size >= 2),
      "fixture: binpack must leave a multi-file bucket")
    withoutAqe {
      val q = spark.read.format("graftdocs").load(p)
        .select(col("doc_id"), col("text"))
        .sortWithinPartitions(col("doc_id"))
      assert(sortCount(q) == 0,
        "binpacked sorted runs must keep the sort elision")
      assert(sortedWithin(q))
    }
  }

  test("a delete vector preserves position order; ordering still reported") {
    val p = freshDir()
    (0L until 40L).map(i => (i, 10L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)
    GdfMaintenance.deleteWhereMor(spark, p,
      Array[Filter](In("doc_id", Array[Any](5L, 13L))))
    withoutAqe {
      val q = spark.read.format("graftdocs").load(p)
        .select(col("doc_id"), col("val"))
        .sortWithinPartitions(col("doc_id"))
      assert(sortCount(q) == 0)
      assert(sortedWithin(q))
      assert(q.count() == 38L)
    }
  }
}
