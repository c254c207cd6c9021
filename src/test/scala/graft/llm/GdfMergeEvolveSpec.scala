package org.apache.spark.sql.graft.dsv2

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins MERGE AUTO-EVOLUTION (r18, the Delta withSchemaEvolution
  * shape): widening as part of the merge commit, refusal without the
  * opt-in, type-conflict failure, null-fill on untouched rows, and the
  * shuffled regime's identical behavior. */
class GdfMergeEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = s"/tmp/graft-me-spec-${System.nanoTime()}"

  private def plant(p: String): Unit =
    (0L until 20L).map(i => (i, 10L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)

  test("an evolving source widens the schema; untouched rows read null") {
    val p = freshDir()
    plant(p)
    GdfMaintenance.mergeInto(spark, p,
      Seq((3L, 33L, "hot"), (100L, 1L, "new"))
        .toDF("doc_id", "val", "tag"),
      autoEvolve = true)
    val m = GdfManifest.read(p)
    assert(m.schema.fieldNames.contains("tag"), "schema must widen")
    val rows = spark.read.format("graftdocs").load(p)
      .select("doc_id", "val", "tag").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))).toMap
    assert(rows(3L) == ((33L, "hot")))
    assert(rows(100L) == ((1L, "new")))
    assert(rows(5L) == ((50L, null)), "untouched rows read null")
    assert(rows.size == 21)
  }

  test("without the opt-in an extra source column is refused") {
    val p = freshDir()
    plant(p)
    val e = intercept[IllegalArgumentException] {
      GdfMaintenance.mergeInto(spark, p,
        Seq((3L, 33L, "x")).toDF("doc_id", "val", "tag"))
    }
    assert(e.getMessage.contains("autoEvolve"), e.getMessage)
  }

  test("a type conflict on a shared column fails loudly") {
    val p = freshDir()
    plant(p)
    val e = intercept[Exception] {
      GdfMaintenance.mergeInto(spark, p,
        Seq((3L, "not-a-long")).toDF("doc_id", "val"), autoEvolve = true)
    }
    assert(e.getMessage.contains("cannot change"), e.getMessage)
  }

  test("the shuffled regime evolves identically") {
    val p = freshDir()
    plant(p)
    GdfMaintenance.mergeInto(spark, p,
      Seq((7L, 77L, 5L), (200L, 2L, 9L)).toDF("doc_id", "val", "score"),
      maxBroadcastRows = 0L, autoEvolve = true)
    assert(GdfMaintenance.lastMergeRegime == "shuffled")
    val rows = spark.read.format("graftdocs").load(p)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(rows(7L) == 5L && rows(200L) == 9L && rows(0L) == -1L)
  }
}
