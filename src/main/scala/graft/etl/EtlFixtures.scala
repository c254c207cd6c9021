package graft.etl

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.star.Star

/** Reference-shaped CSV inputs derived deterministically from the testdata
  * parquet (TESTDATA.md forbids synthesizing unrelated data — these are the
  * SAME rows reshaped into the reference's file formats so the streaming
  * engine can be exercised and oracle-checked against the originals):
  *
  *  - customer master CSV: [[Star.customerDim]] rows with `age` re-encoded
  *    as the reference's bracket STRINGS ('0-17'…'55+') so the pipeline
  *    must re-run the P3 bracket parse (`hybrid_join.py:402`);
  *  - product master CSV: [[Star.productDim]] rows under the reference's
  *    headers (incl. the literal `price$` column);
  *  - transaction stream CSV: one transaction per lineitem with the date
  *    re-encoded as `M/d/yyyy` text so the pipeline must re-run the P4
  *    parse (`hybrid_join.py:422`), split across `nFiles` files to create
  *    multiple micro-batches under `maxFilesPerTrigger`.
  */
object EtlFixtures {

  /** Bracket encoding — the exact inverse of [[Transforms.ageLowerBound]]
    * over the reference's seven observed brackets. */
  private val bracketOf = Map(
    0 -> "0-17", 18 -> "18-25", 26 -> "26-35", 36 -> "36-45",
    46 -> "46-50", 51 -> "51-55", 55 -> "55+")

  def write(spark: SparkSession, sfDir: String, outDir: String, nFiles: Int): Unit = {
    val bracket = bracketOf.foldLeft(lit(null).cast(StringType)) {
      case (acc, (lo, br)) => when(col("age") === lo, br).otherwise(acc)
    }
    Star.customerDim(spark, sfDir)
      .select(
        col("customer_id").as("Customer_ID"),
        col("gender").as("Gender"),
        bracket.as("Age"),
        col("occupation").as("Occupation"),
        col("city_category").as("City_Category"),
        col("stay_in_current_city_years").as("Stay_In_Current_City_Years"),
        col("marital_status").as("Marital_Status"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .csv(s"$outDir/customer_master")

    Star.productDim(spark, sfDir)
      .select(
        col("product_id").as("Product_ID"),
        col("product_category").as("Product_Category"),
        col("price").as("price$"),
        col("store_id").as("storeID"),
        col("supplier_id").as("supplierID"),
        col("store_name").as("storeName"),
        col("supplier_name").as("supplierName"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .csv(s"$outDir/product_master")

    val li = Star.table(spark, sfDir, "lineitem")
    val o = Star.table(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(
        col("l_orderkey").cast(IntegerType).as("orderID"),
        date_format(col("l_shipdate").cast(DateType), "M/d/yyyy").as("date"),
        col("o_custkey").cast(IntegerType).as("Customer_ID"),
        Star.productIdOf(col("l_partkey")).as("Product_ID"),
        col("l_quantity").cast(IntegerType).as("quantity"))
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .csv(s"$outDir/transactions")
  }
}
