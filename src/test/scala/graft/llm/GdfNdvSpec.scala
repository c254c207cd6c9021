package org.apache.spark.sql.graft.dsv2

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the per-file KMV NDV sketches (r18, the Iceberg-Puffin
  * statistics shape): metadata-only estimation (proved by truncating
  * every data file), exactness below k, merge-equals-global over
  * multi-file layouts, rewrite freshness, and loud unknown columns. */
class GdfNdvSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = s"/tmp/graft-ndv-spec-${System.nanoTime()}"

  test("the estimate folds from metadata only — zero data reads") {
    val p = freshDir()
    (0L until 40L).map(i => (i, i % 7)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)
    // destroy every data file: only a metadata answer can survive
    GdfManifest.read(p).files.foreach(f =>
      new java.io.FileOutputStream(new File(p, f.name)).close())
    val (_, est) = GdfMaintenance.ndvEstimate(p, "val")
    assert(est == 7L, s"7 distinct vals, below k=32, must be exact: $est")
    assert(GdfMaintenance.ndvEstimate(p, "doc_id")._2 == 40L)
  }

  test("the multi-file merge equals a single-file global sketch") {
    val p4 = freshDir(); val p1 = freshDir()
    val df = (0L until 300L).map(i => (i, s"w${i % 113}"))
      .toDF("doc_id", "w")
    df.withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p4)
    df.withColumn("bucket", lit(0).cast("int"))
      .write.format("graftdocs").option("buckets", "1")
      .mode("overwrite").save(p1)
    assert(GdfMaintenance.ndvEstimate(p4, "w")
      == GdfMaintenance.ndvEstimate(p1, "w"),
      "union + re-take must equal the global bottom-k (mergeability)")
    // 113 distinct > k=32: the estimator engages; sanity-band it
    val est = GdfMaintenance.ndvEstimate(p4, "w")._2
    assert(est > 40 && est < 350, s"113 true distinct, estimate $est")
  }

  test("rewrites refresh the sketch to the surviving rows") {
    val p = freshDir()
    (0L until 20L).map(i => (i, i % 5)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)
    assert(GdfMaintenance.ndvEstimate(p, "val")._2 == 5L)
    // CoW-delete every row with val == 0 (ids 0,5,10,15)
    GdfMaintenance.deleteWhere(spark, p,
      Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("doc_id",
          Array[Any](0L, 5L, 10L, 15L))))
    assert(GdfMaintenance.ndvEstimate(p, "val")._2 == 4L,
      "the rewritten files' sketches must reflect surviving rows")
  }

  test("unknown or unsketched columns fail loudly") {
    val p = freshDir()
    (0L until 10L).map(i => (i, i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)
    val e = intercept[IllegalArgumentException] {
      GdfMaintenance.ndvEstimate(p, "nope")
    }
    assert(e.getMessage.contains("no NDV sketch"))
  }
}
