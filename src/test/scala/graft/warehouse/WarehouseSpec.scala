package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The materialized warehouse layer: catalog objects, bucketed layout,
  * rebuild stability, and agreement with the direct star builders. */
class WarehouseSpec extends SparkSpec {

  test("D1/D2: database and four catalog tables exist after setup") {
    Warehouse.tables(spark, sf001)
    assert(spark.catalog.databaseExists(Warehouse.database))
    val tables = spark.catalog.listTables(Warehouse.database)
      .collect().map(_.name)
    Seq("salefact", "product_dim", "customer_dim", "time_dim").foreach { t =>
      assert(tables.exists(_.startsWith(t)), s"missing $t table")
    }
  }

  test("salefact is bucketed by order_id with one file per bucket") {
    val t = Warehouse.tables(spark, sf001)
    val name = spark.catalog.listTables(Warehouse.database)
      .collect().map(_.name).find(_.startsWith("salefact")).get
    val meta = spark.sql(s"DESCRIBE TABLE EXTENDED ${Warehouse.database}.$name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(meta("Num Buckets").trim.toInt == Warehouse.factBuckets)
    assert(meta("Bucket Columns").contains("order_id"))
    // one data file per bucket (write tasks aligned with bucket hash)
    val dataFiles = t.fact.inputFiles.length
    assert(dataFiles == Warehouse.factBuckets, s"files=$dataFiles")
  }

  test("warehouse tables agree with the direct star builders") {
    val t = Warehouse.tables(spark, sf001)
    val direct = graft.star.Star.saleFact(spark, sf001)
    assert(t.fact.count() == direct.count())
    val a = t.fact.agg(sum(col("purchase_amount"))).collect().head.getDecimal(0)
    val b = direct.agg(sum(col("purchase_amount"))).collect().head.getDecimal(0)
    assert(a == b)
    assert(t.customer.count() == graft.star.Star.customerDim(spark, sf001).count())
  }

  test("q16 self-join is a shuffle-free bucketed SMJ once broadcast is off") {
    // The warehouse's central physical-layout claim: salefact is bucketed +
    // sorted by order_id, so the basket self-join co-locates WITHOUT an
    // exchange once the fact outgrows the broadcast threshold (at test
    // scale Catalyst broadcasts the 2-column projection instead, so the
    // bucketed path never executes unless broadcast is disabled — this
    // pins the at-scale plan). AQE is disabled for the inspection because
    // AdaptiveSparkPlanExec hides its subtree from collect() until runtime.
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      val plan = graft.SparkEntry.queries("q16_basket_pairs")(spark, sf001)
        .queryExecution.executedPlan
      val smj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.size == 1,
        s"expected the self-join to plan as one SortMergeJoin:\n$plan")
      val exchangesBelowJoin = smj.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(exchangesBelowJoin.isEmpty,
        s"bucketed self-join must read co-located buckets, found exchange:\n${smj.head}")
      // the pair-grouping aggregate above the join still shuffles (its keys
      // are product pairs, not the bucket key) — that one is expected
      val exchangesTotal = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(exchangesTotal.nonEmpty, "sanity: aggregate exchange present")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("rebuild is stable: identical row sets after re-materialization") {
    val before = Warehouse.tables(spark, sf001).fact
      .orderBy(col("sales_id"), col("product_id"), col("purchase_amount"))
      .collect()
    val after = Warehouse.rebuild(spark, sf001).fact
      .orderBy(col("sales_id"), col("product_id"), col("purchase_amount"))
      .collect()
    assert(before.sameElements(after))
  }
}
