package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused native expression must be BIT-identical to the composable
  * fold formulation (the DuckDB oracles are written against the fold). */
class CosineExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("fused cosine == fold cosine, bit-exact, on all sf0.001 pairs") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .where(col("qid") < 25)
    val both = e.crossJoin(broadcast(q))
      .select(
        Similarity.cosine(col("qv"), col("embedding")).as("fused"),
        Similarity.cosineFold(col("qv"), col("embedding")).as("fold"))
    assert(both.where(col("fused") =!= col("fold")).count() == 0)
    assert(both.count() > 10000)
  }

  test("fused cosine: nulls propagate, self-similarity is 1.0") {
    val r = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 3.0f)))
      .toDF("a", "b")
      .select(org.apache.spark.sql.graft.functions.cosine_sim(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(r(0) - 1.0) < 1e-12) // raw (unrounded) expression
    assert(r(1) == 0.0)
    val n = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(org.apache.spark.sql.graft.functions.cosine_sim(col("a"), col("b")).as("c"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("fused cosine survives with codegen disabled (interpreted path)") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val r = Seq((Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
        .select(org.apache.spark.sql.graft.functions.cosine_sim(col("a"), col("b")))
        .collect().head.getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
