package graft.star

/** DuckDB-dialect CTE prelude reconstructing the same star schema as [[Star]]
  * directly over the driver-registered parquet tables (`lineitem`, `orders`,
  * `customer`, `part`, `supplier`, ...). Every oracle query is
  * `WITH <prelude> <body>`; DuckDB prunes unused CTEs.
  *
  * MUST stay semantically in lockstep with [[Star]] — dialect differences
  * only (dayname/monthname vs date_format, list indexing vs element_at).
  */
object StarSql {

  val prelude: String =
    """
customer_dim AS (
  SELECT c_custkey AS customer_id,
         CASE WHEN c_custkey % 2 = 0 THEN 'F' ELSE 'M' END AS gender,
         [0,18,26,36,46,51,55][CAST(c_custkey % 7 AS INT) + 1] AS age,
         CAST(c_custkey % 21 AS VARCHAR) AS occupation,
         ['A','B','C'][CAST(c_nationkey % 3 AS INT) + 1] AS city_category,
         CAST(c_custkey % 5 AS VARCHAR) AS stay_in_current_city_years,
         CAST(c_custkey % 2 AS VARCHAR) AS marital_status
  FROM customer),
product_dim AS (
  SELECT printf('P%08d', p_partkey) AS product_id,
         p_brand AS product_category,
         CAST(p_retailprice AS DECIMAL(10,2)) AS price,
         CAST(p_partkey % 8 + 1 AS INT) AS store_id,
         'Store_' || CAST(p_partkey % 8 + 1 AS INT) AS store_name,
         CAST(p_partkey % (SELECT count(*) FROM supplier) AS INT) AS supplier_id,
         s.s_name AS supplier_name
  FROM part
  JOIN supplier s ON s.s_suppkey = p_partkey % (SELECT count(*) FROM supplier)),
time_dim AS (
  SELECT CAST(year(d)*10000 + month(d)*100 + day(d) AS BIGINT) AS date_id,
         d AS full_date,
         dayname(d) AS day_of_week,
         monthname(d) AS month,
         quarter(d) AS quarter,
         CASE WHEN month(d) IN (12,1,2) THEN 'Winter'
              WHEN month(d) IN (3,4,5) THEN 'Spring'
              WHEN month(d) IN (6,7,8) THEN 'Summer'
              ELSE 'Autumn' END AS season,
         year(d) AS year
  FROM (SELECT DISTINCT CAST(l_shipdate AS DATE) AS d FROM lineitem)),
salefact AS (
  SELECT l_orderkey*10 + l_linenumber AS sales_id,
         l_orderkey AS order_id,
         o_custkey AS customer_id,
         printf('P%08d', l_partkey) AS product_id,
         CAST(year(CAST(l_shipdate AS DATE))*10000
            + month(CAST(l_shipdate AS DATE))*100
            + day(CAST(l_shipdate AS DATE)) AS BIGINT) AS date_id,
         CAST(l_quantity AS BIGINT) AS quantity,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(14,4)) AS purchase_amount
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
""".trim

  /** Wrap a query body with the star-schema prelude. */
  def withStar(body: String): String = s"WITH $prelude\n$body"
}
