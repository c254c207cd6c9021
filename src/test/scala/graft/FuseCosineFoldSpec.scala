package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CosineSimilarity, GraftExtensions}

import graft.llm.Similarity

/** Pins the [[org.apache.spark.sql.graft.FuseCosineFold]] optimizer rule:
  * the composable cosine fold over ARRAY<FLOAT> is rewritten to the
  * native [[CosineSimilarity]] kernel with bit-identical results; the
  * ARRAY<DOUBLE> form, a different round scale, and cross-wired norms
  * are all left alone. */
class FuseCosineFoldSpec extends SparkSpec {

  GraftExtensions.register(spark)

  private def fused(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[CosineSimilarity])))

  private lazy val pairs = {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    e.crossJoin(broadcast(q)).where(col("vec_id") =!= col("qid"))
  }

  test("the float-array fold is rewritten to the native kernel, same bits") {
    val viaFold = pairs.select(col("vec_id"), col("qid"),
      Similarity.cosineFold(col("embedding"), col("qv")).as("c"))
    assert(fused(viaFold), "rule did not fire on the canonical fold:\n" +
      viaFold.queryExecution.optimizedPlan)
    val viaNative = pairs.select(col("vec_id"), col("qid"),
      Similarity.cosine(col("embedding"), col("qv")).as("c"))
    val a = viaFold.orderBy(col("qid"), col("vec_id")).collect()
    val b = viaNative.orderBy(col("qid"), col("vec_id")).collect()
    assert(a.sameElements(b), "fused rewrite changed bits")
  }

  test("the graded sql_similarity_topk_fused entry really exercises the rule") {
    // the entry's SQL spells the HOF fold; without this pin it could go
    // green on the fold alone (bit-identical) without certifying fusion
    val df = SparkEntry.queries("sql_similarity_topk_fused")(spark, sf001)
    assert(fused(df), "the graded entry's plan does not contain the " +
      s"native kernel:\n${df.queryExecution.optimizedPlan}")
  }

  test("guards: double arrays, other scales, cross-wired norms stay unfused") {
    val dbl = pairs.select(
      Similarity.cosineFold(
        transform(col("embedding"), _.cast("double")),
        transform(col("qv"), _.cast("double"))).as("c"))
    assert(!fused(dbl), "rule fired on ARRAY<DOUBLE> (native kernel is float-only)")

    val scale5 = pairs.select(
      round(Similarity.dot(col("embedding"), col("qv")) /
        (Similarity.norm(col("embedding")) * Similarity.norm(col("qv"))), 5).as("c"))
    assert(!fused(scale5), "rule fired on a non-6dp round")

    val crossWired = pairs.select(
      round(Similarity.dot(col("embedding"), col("qv")) /
        (Similarity.norm(col("embedding")) * Similarity.norm(col("embedding"))), 6).as("c"))
    assert(!fused(crossWired), "rule fired with the wrong norm pairing")
  }
}
