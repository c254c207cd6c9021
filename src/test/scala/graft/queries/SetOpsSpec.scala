package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The `setops_buyers` entry computes UNION/INTERSECT/EXCEPT semantics in
  * its 1-shuffle membership-flag form (ExtraQueries.scala). This spec keeps
  * Spark's literal `.intersect`/`.except`/`.union` operators exercised and
  * proves the two formulations produce the identical relation on data with
  * overlap, disjoint members, and duplicates. */
class SetOpsSpec extends SparkSpec {
  import spark.implicits._

  // (customer, category) purchases with dups; a∩b, a∖b, b∖a all non-empty
  private val purchases = Seq(
    (1L, "a"), (1L, "a"), (1L, "b"), // both
    (2L, "a"),                       // only_a
    (3L, "b"), (3L, "b"),            // only_b
    (4L, "a"), (4L, "b"),            // both
    (5L, "c")                        // neither relation
  ).toDF("customer_id", "cat")

  private def literalForm(df: DataFrame): Seq[(Long, String)] = {
    def of(c: String) =
      df.where(col("cat") === c).select("customer_id").distinct()
    val a = of("a"); val b = of("b")
    a.intersect(b).withColumn("relation", lit("both"))
      .union(a.except(b).withColumn("relation", lit("only_a")))
      .union(b.except(a).withColumn("relation", lit("only_b")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
  }

  private def flagForm(df: DataFrame): Seq[(Long, String)] =
    df.where(col("cat").isin("a", "b"))
      .groupBy(col("customer_id"))
      .agg(max(col("cat") === "a").as("in_a"), max(col("cat") === "b").as("in_b"))
      .select(col("customer_id"),
        when(col("in_a") && col("in_b"), "both")
          .when(col("in_a"), "only_a").otherwise("only_b").as("relation"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("1-shuffle flag aggregation == literal INTERSECT/EXCEPT/UNION relation") {
    val lit = literalForm(purchases)
    assert(lit === Seq((1L, "both"), (2L, "only_a"), (3L, "only_b"), (4L, "both")))
    assert(flagForm(purchases) === lit)
  }

  test("degenerate cases: one side empty, both empty") {
    val onlyA = Seq((1L, "a"), (2L, "a")).toDF("customer_id", "cat")
    assert(flagForm(onlyA) === literalForm(onlyA))
    val neither = Seq((1L, "c")).toDF("customer_id", "cat")
    assert(flagForm(neither) === literalForm(neither))
    assert(flagForm(neither) === Seq.empty)
  }
}
