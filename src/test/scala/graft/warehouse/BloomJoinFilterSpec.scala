package graft.warehouse

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Certifies Spark's RUNTIME BLOOM-FILTER join pruning — the shuffle-join
  * analogue of [[DppSpec]]'s partition pruning: when a selective dim
  * filter feeds a shuffle equi-join, the optimizer builds a Bloom filter
  * from the dim keys and applies `might_contain` on the fact side BEFORE
  * the exchange, so most fact rows drop pre-shuffle. On a 100 TB fact ⋈
  * filtered-dim join this is the difference between shuffling the corpus
  * and shuffling the matching slice. Thresholds are lowered to fire on
  * test-sized relations (the feature gates on scan sizes); broadcast is
  * disabled because the injection only targets probable shuffle joins. */
class BloomJoinFilterSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim filter injects a bloom might_contain on the fact side") {
    val factDir = Files.createTempDirectory("graft-bjf-fact").toFile
      .getAbsolutePath
    val dimDir = Files.createTempDirectory("graft-bjf-dim").toFile
      .getAbsolutePath
    (0 until 20000).map(i => (i.toLong % 500L, i.toLong))
      .toDF("k", "amount").write.mode("overwrite").parquet(factDir)
    (0 until 500).map(i => (i.toLong, i % 10)).toDF("k", "grp")
      .write.mode("overwrite").parquet(dimDir)

    val conf = spark.conf
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")

      val fact = spark.read.parquet(factDir)
      val dim = spark.read.parquet(dimDir).where(col("grp") === 3)
      val q = fact.join(dim, "k")
        .groupBy(col("grp")).agg(sum(col("amount")).as("total"))

      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a runtime bloom filter on the fact side:\n$optimized")

      // correctness: identical to the run with the feature off
      val got = q.collect().map(r =>
        (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSet
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val want = fact.join(dim, "k")
        .groupBy(col("grp")).agg(sum(col("amount")).as("total"))
        .collect().map(r =>
          (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSet
      assert(got == want && got.nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
