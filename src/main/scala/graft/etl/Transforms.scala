package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.star.Star

/** The P-transforms (SURVEY §2.2) as reusable column expressions — all
  * built-ins, Catalyst-optimizable, no UDFs. */
object Transforms {

  /** P3: age-bracket lower bound — `'26-35'→26`, `'55+'→55`
    * (reference `hybrid_join.py:402`). */
  def ageLowerBound(age: Column): Column =
    regexp_extract(age, "^(\\d+)", 1).cast(IntegerType)

  /** P4: `M/d/yyyy` date parse (reference `hybrid_join.py:422`). */
  def parseDate(s: Column): Column = to_date(s, "M/d/yyyy")

  /** Master CSV → customer_dim shape (reference `hybrid_join.py:399-407`). */
  def customerDimFromMaster(master: DataFrame): DataFrame =
    master.select(
      col("Customer_ID").as("customer_id"),
      col("Gender").as("gender"),
      ageLowerBound(col("Age")).as("age"),
      col("Occupation").as("occupation"),
      col("City_Category").as("city_category"),
      col("Stay_In_Current_City_Years").as("stay_in_current_city_years"),
      col("Marital_Status").as("marital_status"))

  /** Master CSV → product_dim shape (reference `hybrid_join.py:410-418`;
    * the CSV column is literally named `price$`). */
  def productDimFromMaster(master: DataFrame): DataFrame =
    master.select(
      col("Product_ID").as("product_id"),
      col("Product_Category").as("product_category"),
      col("price$").as("price"),
      col("storeID").as("store_id"),
      col("storeName").as("store_name"),
      col("supplierID").as("supplier_id"),
      col("supplierName").as("supplier_name"))

  /** P6: full time_dim row from a date column (reference
    * `hybrid_join.py:429-444`); date_id is the deterministic yyyyMMdd
    * surrogate shared with the batch star builder. */
  def timeDimRow(d: Column): Seq[Column] = Seq(
    Star.dateId(d).as("date_id"),
    d.as("full_date"),
    date_format(d, "EEEE").as("day_of_week"),
    date_format(d, "MMMM").as("month"),
    quarter(d).as("quarter"),
    Star.seasonOf(d).as("season"),
    year(d).as("year"))
}
