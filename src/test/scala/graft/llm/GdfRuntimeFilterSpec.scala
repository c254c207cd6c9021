package org.apache.spark.sql.graft.dsv2

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, In}

import graft.SparkSpec

/** Pins the main batch scan's two new planner contracts (r18):
  *
  *  - [[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]]
  *    on `doc_id`: a star join against a selective dim plants a
  *    dynamic-pruning subquery, and at RUNTIME the scan drops whole
  *    files from the dim's actual keys (zone map + Bloom + bucket pin) —
  *    the partition count the join executes over shrinks below the
  *    static file set;
  *  - [[org.apache.spark.sql.connector.read.SupportsReportStatistics]]:
  *    post-pruning LIVE rows and bytes flow into Catalyst, so a small
  *    graftdocs side auto-broadcasts WITHOUT a hint, a pushed filter
  *    shrinks the reported stats, and a merge-on-read delete's vector
  *    rows are excluded from the row count.
  */
class GdfRuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = s"/tmp/graft-rtf-spec-${System.nanoTime()}"

  private def plant(p: String, n: Long = 40L): Unit =
    (0L until n).map(i => (i, 10L * i, s"t$i")).toDF("doc_id", "val", "tag")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)

  private def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("join keys prune scan files at runtime (dynamic pruning subquery)") {
    val p = freshDir()
    plant(p)
    // the dim must live on disk (an in-memory Seq folds its filter into
    // the LocalRelation before PartitionPruning runs) and the filter
    // must be a COMPARISON — a bare boolean column is not "likely
    // selective" to the pruning rule (DppSpec's lessons)
    val dimDir = Files.createTempDirectory("graft-rtf-dim").toFile
      .getAbsolutePath
    (0L until 40L).map(i => (i, if (i % 4 == 1 && i < 8) 1L else 0L))
      .toDF("doc_id", "grp")
      .write.mode("overwrite").parquet(dimDir)
    withoutAqe {
      val fact = spark.read.format("graftdocs").load(p)
        .select(col("doc_id"), col("val"))
      val dim = spark.read.parquet(dimDir).where(col("grp") === 1L)
      val q = fact.join(broadcast(dim), Seq("doc_id")).select("doc_id", "val")

      val scan = q.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec if b.scan.isInstanceOf[GdfScan] => b
      }.getOrElse(fail(s"no graftdocs BatchScanExec:\n${q.queryExecution}"))
      assert(scan.runtimeFilters.nonEmpty,
        s"scan must carry a runtime filter:\n${q.queryExecution.executedPlan}")

      // keys {1, 5} both hash into bucket 1 -> of the 4 static bucket
      // files, exactly 1 survives the runtime prune. Execute THIS plan
      // instance (a derived Dataset would leave its subquery unrun).
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 10L), (5L, 50L)))
      assert(scan.inputRDD.getNumPartitions == 1,
        "runtime keys {1,5} must prune the scan to bucket 1's single file")
    }
  }

  test("reported statistics: live rows, filter-pruned sizes, dv exclusion") {
    val p = freshDir()
    plant(p)
    def scanStats(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.stats
      }.getOrElse(fail("no v2 scan relation in the optimized plan"))

    val full = scanStats(spark.read.format("graftdocs").load(p))
    assert(full.rowCount.contains(BigInt(40)),
      s"full scan must report 40 rows, got ${full.rowCount}")

    // EqualTo pushes down -> bucket pin -> one file's stats only
    val pinned = scanStats(
      spark.read.format("graftdocs").load(p).where(col("doc_id") === 6L))
    assert(pinned.rowCount.contains(BigInt(10)),
      s"bucket-pinned scan must report one file's 10 rows, got ${pinned.rowCount}")
    assert(pinned.sizeInBytes < full.sizeInBytes,
      "pruned scan must report fewer bytes than the full scan")

    // merge-on-read delete: vector rows leave the LIVE count, bytes scale
    GdfMaintenance.deleteWhereMor(spark, p,
      Array[Filter](In("doc_id", Array[Any](3L, 7L, 11L))))
    val afterDv = scanStats(spark.read.format("graftdocs").load(p))
    assert(afterDv.rowCount.contains(BigInt(37)),
      s"dv'd scan must report 37 live rows, got ${afterDv.rowCount}")
  }

  test("small graftdocs side auto-broadcasts from reported stats (no hint)") {
    val p = freshDir()
    plant(p) // tiny: a few KB on disk
    val bigDir = Files.createTempDirectory("graft-rtf-big").toFile
      .getAbsolutePath
    spark.range(0L, 20000L).select(
        pmod(col("id"), lit(40L)).as("doc_id"),
        (col("id") * 3L).as("payload"))
      .write.mode("overwrite").parquet(bigDir)
    withoutAqe {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        // threshold between the two sides' reported sizes: only the
        // connector's stats can qualify it for the broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "50KB")
        val q = spark.read.parquet(bigDir)
          .join(spark.read.format("graftdocs").load(p)
            .select(col("doc_id"), col("val")), Seq("doc_id"))
        val bhj = q.queryExecution.executedPlan.collectFirst {
          case b: BroadcastHashJoinExec => b
        }
        assert(bhj.isDefined,
          s"expected an auto-broadcast join:\n${q.queryExecution.executedPlan}")
        assert(q.count() == 20000L)
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
