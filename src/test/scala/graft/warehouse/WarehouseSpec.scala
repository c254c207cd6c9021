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
