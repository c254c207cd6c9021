package graft.llm

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Certifies the custom `graftdocs` DataSourceV2 connector
  * ([[org.apache.spark.sql.graft.dsv2.GraftDocsSource]], r14): exact
  * round-trip through the bucketed columnar format, COLUMN PRUNING
  * visible in the scan's ReadSchema, doc_id FILTER PUSHDOWN visible as
  * PushedFilters AND as file-level partition pruning (EqualTo prunes to
  * the single hash bucket), and the REPORTED PARTITIONING removing the
  * shuffle for bucket-aligned consumers (key-grouped aggregation and a
  * storage-partitioned self-join, both pinned to ZERO exchanges under
  * `spark.sql.sources.v2.bucketing.enabled`). */
class GraftDocsSourceSpec extends SparkSpec {

  private lazy val viaConnector = DocsDsv2.docs(spark, sf001)
  private lazy val viaParquet =
    spark.read.parquet(s"$sf001/documents.parquet")

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("round-trip: connector read equals the parquet table exactly") {
    val a = viaConnector.select(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars")).orderBy(col("doc_id")).collect()
    val b = viaParquet.select(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars")).orderBy(col("doc_id")).collect()
    assert(a.length == b.length && a.sameElements(b))
  }

  test("column pruning reaches the scan: ReadSchema keeps only used columns") {
    val scan = scanOf(viaConnector.select(col("doc_id"), col("lang")))
    val desc = scan.scan.description()
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("doc_id", "lang"),
      s"pruned schema wrong: ${scan.scan.readSchema()}")
    assert(desc.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"description missing pruned schema: $desc")
    assert(!desc.contains("text"), "text survived pruning")
  }

  test("doc_id pushdown: PushedFilters reported and files pruned to one bucket") {
    val filtered = viaConnector.where(col("doc_id") === 42L)
    val scan = scanOf(filtered)
    assert(scan.scan.description().contains("EqualTo(doc_id,42)"),
      s"pushed filter missing: ${scan.scan.description()}")
    assert(scan.inputRDD.getNumPartitions == 1,
      s"EqualTo should prune to the single pmod bucket, got " +
        s"${scan.inputRDD.getNumPartitions}")
    // the residual re-evaluation keeps row-level semantics exact
    assert(filtered.count() == 1L)
    // range pushdown prunes by the doc_id zone maps: with doc_id hashed
    // across buckets every file spans a wide range, but an out-of-range
    // predicate must drop ALL files
    val none = scanOf(viaConnector.where(col("doc_id") > 1000000L))
    assert(none.inputRDD.getNumPartitions == 0, "zone maps did not prune")
  }

  test("reported partitioning: bucket-keyed aggregation runs with no shuffle") {
    withConf("spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val agg = viaConnector.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      val exchanges = agg.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"key-grouped scan should satisfy the aggregate's distribution:\n" +
          agg.queryExecution.executedPlan)
      // and the numbers are right
      val total = agg.agg(sum(col("n"))).collect()(0).getLong(0)
      assert(total == viaParquet.count())
    }
  }

  test("storage-partitioned self-join on the bucket key has no shuffle") {
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val l = viaConnector.select(col("bucket"), col("doc_id"), col("n_chars"))
      val r = viaConnector.select(col("bucket"), col("doc_id"),
        col("lang").as("lang_r"))
      val joined = l.join(r, Seq("bucket", "doc_id"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"SPJ should run exchange-free:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == viaParquet.count(), "join lost rows")
    }
  }

  test("dsv2_text_stats twin equals text_stats bit for bit") {
    val a = TextAnalysis.statsOf(viaConnector).collect()
    val b = TextAnalysis.stats(spark, sf001).collect()
    assert(a.sameElements(b))
  }
}
