package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The hybrid-join core (reference `hybrid_join.py:119-354`, ~190 LoC of
  * hash-table/FIFO-queue/partition-range machinery) re-expressed as its
  * actual SEMANTICS: two stream-static broadcast equi-joins.
  *
  *  - J1 stream⋈customer is INNER — the reference evicts stream tuples
  *    whose key is in no master partition ("aggressive inner-join
  *    filtering", report p.4; `hybrid_join.py:226-231,332-354`).
  *  - J2 stream⋈product is LEFT OUTER — an unmatched product keeps the
  *    partial tuple (`hybrid_join.py:283-303`); the warehouse load then
  *    cannot build a fact row from it (the reference would KeyError at
  *    `hybrid_join.py:413`), so the SINK drops product-less rows — the
  *    observable warehouse content is inner (SURVEY §2.3 J2 decision).
  *  - P2: null-key stream tuples are dropped up front
  *    (`hybrid_join.py:187-190`).
  *
  * The MESHJOIN state machinery (10k-slot hash table, FIFO eviction,
  * 500-row partition pruning) exists only because the reference can't hold
  * master data per-probe; with broadcast masters the join is STATELESS per
  * micro-batch (ST5) and the same function serves batch tests and the
  * streaming pipeline unchanged.
  *
  * This is also the 100 TB shape: masters are dimension-sized (broadcast);
  * the stream side never shuffles — enrichment is map-side in every
  * micro-batch regardless of stream volume.
  */
object Enrich {

  def enrich(txns: DataFrame, customers: DataFrame, products: DataFrame): DataFrame =
    txns
      .filter(col("Customer_ID").isNotNull) // P2
      .join(broadcast(customers.withColumnRenamed("customer_id", "Customer_ID")),
        Seq("Customer_ID"), "inner") // J1
      .join(broadcast(products.withColumnRenamed("product_id", "Product_ID")),
        Seq("Product_ID"), "left_outer") // J2
}
