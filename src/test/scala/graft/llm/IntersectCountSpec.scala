package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r20 `intersect_count` kernel exactly equal to
  * `size(array_intersect(a, b))` — on real corpus shingle sets and on
  * the fixtures where set semantics could diverge (duplicates on either
  * side, empty, disjoint, null). */
class IntersectCountSpec extends SparkSpec {
  import spark.implicits._

  private val ic = org.apache.spark.sql.graft.functions.intersect_count _

  test("kernel == size(array_intersect) on sf0.001 shingle sets") {
    val sets = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"),
        graft.llm.Text.shingles(col("text"), Dedup.ShingleK).as("sset"))
      .where(size(col("sset")) >= 1)
      .limit(60)
    val pairs = sets.as("a").crossJoin(sets.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(
        ic(col("a.sset"), col("b.sset")).as("k"),
        size(array_intersect(col("a.sset"), col("b.sset")))
          .cast("long").as("c"))
    assert(pairs.where(col("k") =!= col("c")).isEmpty)
    assert(pairs.where(col("k") > 0).count() > 0) // non-vacuous
  }

  test("duplicates, empty, disjoint, null match array_intersect") {
    val df = Seq(
      (Seq("a", "a", "b"), Seq("a", "c")), // dup on build side
      (Seq("a", "b"), Seq("b", "b", "b")), // dup on probe side
      (Seq.empty[String], Seq("x")), // empty
      (Seq("x"), Seq.empty[String]),
      (Seq("p", "q"), Seq("r", "s")), // disjoint
      (Seq("p", "q", "r"), Seq("r", "p")) // order-free
    ).toDF("a", "b")
    val bad = df.select(
        ic(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("c"))
      .where(col("k") =!= col("c"))
    assert(bad.isEmpty)
    // null input -> null, like the composed form
    val n = Seq((Seq("a"), null.asInstanceOf[Seq[String]])).toDF("a", "b")
      .select(ic(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).as("c"))
      .collect().head
    assert(n.isNullAt(0) && (n.isNullAt(1) || n.getInt(1) == -1))
  }
}
