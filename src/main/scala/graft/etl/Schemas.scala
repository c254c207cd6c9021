package graft.etl

import org.apache.spark.sql.types._

/** Explicit input schemas for the ETL (no `inferSchema` in production
  * paths — SURVEY §1.1). Shapes mirror the reference's CSV inputs:
  * customer master (reference `customer_master_data.csv`, loaded at
  * `hybrid_join.py:44-57`), product master (`product_master_data.csv`,
  * note the literal `price$` column, `hybrid_join.py:413`), and the
  * transaction stream (schema inferred in SURVEY §1.2 from the loader's
  * reads: `hybrid_join.py:158,160,422,451,456`).
  */
object Schemas {

  val customerMaster: StructType = StructType(Seq(
    StructField("Customer_ID", IntegerType),
    StructField("Gender", StringType),
    StructField("Age", StringType), // bracket string: '0-17' .. '55+'
    StructField("Occupation", StringType),
    StructField("City_Category", StringType),
    StructField("Stay_In_Current_City_Years", StringType),
    StructField("Marital_Status", StringType)))

  val productMaster: StructType = StructType(Seq(
    StructField("Product_ID", StringType),
    StructField("Product_Category", StringType),
    StructField("price$", DecimalType(10, 2)),
    StructField("storeID", IntegerType),
    StructField("supplierID", IntegerType),
    StructField("storeName", StringType),
    StructField("supplierName", StringType)))

  val transaction: StructType = StructType(Seq(
    StructField("orderID", IntegerType),
    StructField("date", StringType), // "M/d/yyyy" (hybrid_join.py:422)
    StructField("Customer_ID", IntegerType),
    StructField("Product_ID", StringType),
    StructField("quantity", IntegerType)))
}
