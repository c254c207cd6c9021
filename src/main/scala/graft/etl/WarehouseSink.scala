package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Transforms._

/** The warehouse-load half of the reference engine
  * (`hybrid_join.py:361-471`) as a `foreachBatch` sink over a parquet
  * warehouse directory:
  *
  *  - S7 dim upsert, SCD type 0 / first-write-wins (`INSERT … ON DUPLICATE
  *    KEY UPDATE pk = pk`, `hybrid_join.py:364-378`): new-keys-only
  *    anti-join append — existing dimension rows are never updated.
  *  - S8 time_dim lookup-or-insert (`hybrid_join.py:381-389,421-449`): new
  *    distinct dates are derived and appended; `date_id` is the
  *    deterministic yyyyMMdd surrogate instead of the reference's
  *    load-order auto_increment (order-independent ⇒ replay-safe; queries
  *    only ever use date_id as a join key, SURVEY §7.4.5).
  *  - S9 fact append (`hybrid_join.py:392-396,455-465`): fact rows land in
  *    a `batch_id=<n>` partition.
  *  - S10/ST8 delivery semantics: the fact write uses dynamic partition
  *    OVERWRITE of the batch's own partition — replaying a micro-batch
  *    (Structured Streaming is at-least-once into foreachBatch) rewrites
  *    the identical partition instead of duplicating rows ⇒ effectively
  *    exactly-once. Dim/time appends are idempotent by construction (the
  *    anti-join sees partially-appended keys and skips them). This
  *    replaces the reference's per-batch MySQL commit/rollback
  *    (`hybrid_join.py:448,465-471`).
  *
  * 100 TB notes: dims are anti-joined against only the dim table (small);
  * the fact append is a partitioned columnar write with no shuffle. At
  * cluster scale the same layout works with the fact additionally
  * bucketed/sorted inside each batch partition and periodically compacted.
  */
object WarehouseSink {

  private def existingOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame =
    if (new java.io.File(path).exists()) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Load one enriched micro-batch into the warehouse at `whDir`. */
  def load(enriched: DataFrame, batchId: Long, whDir: String): Unit = {
    val spark = enriched.sparkSession
    enriched.persist()
    try {
      // --- S7: customer dim, first-write-wins ---
      val custPath = s"$whDir/customer_dim"
      val batchCust = enriched.select(
        col("Customer_ID").as("customer_id"),
        col("gender"), col("age"), col("occupation"), col("city_category"),
        col("stay_in_current_city_years"), col("marital_status"))
        .dropDuplicates("customer_id")
      val newCust = batchCust.join(
        existingOrEmpty(spark, custPath, batchCust.schema)
          .select("customer_id"),
        Seq("customer_id"), "left_anti")
      newCust.write.mode(SaveMode.Append).parquet(custPath)

      // --- S7: product dim, first-write-wins (only product-matched rows
      // carry dim attributes — J2 is left-outer) ---
      val prodPath = s"$whDir/product_dim"
      val batchProd = enriched.where(col("price").isNotNull).select(
        col("Product_ID").as("product_id"),
        col("product_category"), col("price"), col("store_id"),
        col("store_name"), col("supplier_id"), col("supplier_name"))
        .dropDuplicates("product_id")
      val newProd = batchProd.join(
        existingOrEmpty(spark, prodPath, batchProd.schema)
          .select("product_id"),
        Seq("product_id"), "left_anti")
      newProd.write.mode(SaveMode.Append).parquet(prodPath)

      // --- S8: time dim maintenance ---
      val timePath = s"$whDir/time_dim"
      val batchTime = enriched
        .select(parseDate(col("date")).as("d")).distinct()
        .select(timeDimRow(col("d")): _*)
      val newTime = batchTime.join(
        existingOrEmpty(spark, timePath, batchTime.schema)
          .select("date_id"),
        Seq("date_id"), "left_anti")
      newTime.write.mode(SaveMode.Append).parquet(timePath)

      // --- S9 + ST8: fact append, exactly-once via per-batch partition
      // overwrite. P5: purchase_amount = round(quantity·price, 2)
      // (`hybrid_join.py:451-453`); rows without a product match cannot
      // form a fact row (observable-inner, SURVEY §2.3 J2). ---
      val factPath = s"$whDir/salefact"
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      enriched.where(col("price").isNotNull).select(
        col("orderID").as("order_id"),
        col("Customer_ID").as("customer_id"),
        col("Product_ID").as("product_id"),
        graft.star.Star.dateId(parseDate(col("date"))).as("date_id"),
        col("quantity"),
        round(col("quantity") * col("price"), 2).as("purchase_amount"),
        lit(batchId).as("batch_id"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("batch_id")
        .parquet(factPath)
    } finally enriched.unpersist()
  }
}
