package graft.warehouse

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Certifies DYNAMIC PARTITION PRUNING on a date-partitioned fact: a
  * star query that filters the dim side must prune the fact scan's
  * partition list at RUNTIME from the broadcast join keys — on a 100 TB
  * date-partitioned fact this is the difference between scanning the
  * whole history and scanning the filtered months, and it cannot be
  * expressed as a static filter because the fact query never mentions
  * `year`. Pins (a) the `dynamicpruning` expression in the scan's
  * partition filters, (b) the RUNTIME partition-read metric = exactly
  * the dim-selected months, (c) result equality with the unpartitioned
  * compute. */
class DppSpec extends SparkSpec {
  import spark.implicits._

  test("dim filter prunes the partitioned fact scan at runtime") {
    val dir = Files.createTempDirectory("graft-dpp").toFile.getAbsolutePath
    // 24 months × 50 rows, partitioned by month on disk
    val fact = (0 until 24).flatMap(m =>
      (0 until 50).map(i => (m.toLong, i.toLong, (m * 100 + i).toLong)))
      .toDF("month_id", "item", "amount")
    fact.write.mode("overwrite").partitionBy("month_id").parquet(dir)
    // month registry: 12 months of 2019, 12 of 2020 — written to disk:
    // an in-memory Seq folds its Filter into the LocalRelation before
    // the PartitionPruning rule runs, and DPP requires a visible
    // selective filter on the dim side (as any real dim table has)
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toFile
      .getAbsolutePath
    (0 until 24).map(m => (m.toLong, 2019 + m / 12))
      .toDF("month_id", "year")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val q = spark.read.parquet(dir)
        .join(broadcast(dim.where(col("year") === 2020)), "month_id")
        .groupBy(col("month_id")).agg(sum(col("amount")).as("total"))

      val scans = q.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec if f.relation.partitionSchema.nonEmpty => f
      }
      assert(scans.size == 1,
        s"expected one partitioned fact scan:\n${q.queryExecution}")
      assert(scans.head.partitionFilters.exists(
        _.toString.contains("dynamicpruning")),
        s"fact scan must carry a dynamicpruning partition filter:\n" +
          scans.head.partitionFilters.mkString("\n"))

      val rows = q.collect()
      // runtime metric: only the 12 selected months were read
      assert(scans.head.metrics("numPartitions").value == 12,
        s"expected 12 partitions read, got ${scans.head.metrics("numPartitions").value}")

      // correctness vs the unpartitioned compute (partition-column read
      // back as int — compare through Number)
      def kv(r: org.apache.spark.sql.Row): (Long, Long) =
        (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
      val expect = fact
        .join(dim.where(col("year") === 2020), "month_id")
        .groupBy(col("month_id")).agg(sum(col("amount")).as("total"))
        .collect().map(kv).toMap
      assert(rows.map(kv).toMap == expect)
      assert(rows.map(kv(_)._1).toSet == (12L until 24L).toSet)
    } finally conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
