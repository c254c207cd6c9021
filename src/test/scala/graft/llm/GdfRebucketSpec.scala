package org.apache.spark.sql.graft.dsv2

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, In}

import graft.SparkSpec

/** Pins REBUCKET — hash-layout partition evolution (r18): content
  * identity, the new layout's bucket-pin pruning, delete reconciliation
  * on the way through, and old-layout time travel. */
class GdfRebucketSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = s"/tmp/graft-rb-spec-${System.nanoTime()}"

  test("rebucket rewrites the layout, reconciles deletes, keeps history") {
    val p = freshDir()
    (0L until 40L).map(i => (i, 10L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p) // v1: 4 buckets
    GdfMaintenance.deleteByKeys(p, Seq(6L)) // v2: eq delete pending
    GdfMaintenance.rebucket(spark, p, 8) // v3: 8 buckets
    val m = GdfManifest.read(p)
    assert(m.buckets == 8 && m.files.map(_.bucket).toSet == (0 until 8).toSet)
    assert(m.eqDeletes.isEmpty,
      "the rewrite reads through the connector - eq deletes reconcile")
    // content = v1 minus the delete; per-file rows respect the new pmod
    val t = spark.read.format("graftdocs").load(p)
    assert(t.select("doc_id").as[Long].collect().toSet ==
      (0L until 40L).toSet - 6L)
    m.files.foreach(f => assert(
      java.lang.Math.floorMod(f.minDocId, 8L) == f.bucket &&
        java.lang.Math.floorMod(f.maxDocId, 8L) == f.bucket))
    // the new layout's EqualTo bucket pin prunes to one file
    val one = t.where(col("doc_id") === 9L)
    one.collect()
    val scan = one.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.inputRDD.getNumPartitions == 1,
      "post-rebucket point lookup must pin the new hash bucket")
    // the 4-bucket layout stays time-travelable
    val v1 = spark.read.format("graftdocs").option("version", "1").load(p)
    assert(v1.count() == 40L)
  }
}
