package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the IVF-ADC composition ([[Similarity.ivfAdcTopKOf]], r13): the
  * PRUNING CONTRACT — every returned neighbor's assigned centroid is
  * among its query's probed lists (candidates never leak from unprobed
  * lists) — plus a measured recall floor on the real sf0.001 corpus
  * (r14: 0.8 with TRAINED codebooks, from 0.1 untrained; NProbe /
  * codebook size / training / rerank width are the published knobs). */
class IvfAdcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = spark.read.parquet(s"$sf001/embeddings.parquet")
  private lazy val idx = Similarity.ivfIndexOf(e, Similarity.CentroidBase,
    Similarity.Centroids, Similarity.QueryCount, Similarity.NProbe)
  private lazy val result = Similarity.ivfAdcTopKOf(e, idx,
    Similarity.pqTrainedCodebookOf(e), Similarity.QueryCount,
    Similarity.NProbe, Similarity.PqCandidates, Similarity.TopK)

  test("every returned neighbor lies in a probed list of its query") {
    val assigned = idx.where(col("rn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cent_id").as("ncent"))
    val probes = idx.where(col("vec_id") < Similarity.QueryCount &&
        col("rn") <= Similarity.NProbe)
      .select(col("vec_id").as("query_id"), col("cent_id").as("qcent"))
    val leaked = result
      .join(assigned, "neighbor_id")
      .join(probes, Seq("query_id"), "left")
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(when(col("ncent") === col("qcent"), 1).otherwise(0)).as("hit"))
      .where(col("hit") === 0)
      .count()
    assert(leaked == 0L, "a neighbor escaped the probed lists")
  }

  test("recall@5 vs brute force is measured and above the floor") {
    val brute = Similarity.bruteTopK(spark, sf001)
      .select(col("query_id"), col("neighbor_id"))
    val ivfpq = result.select(col("query_id").as("q2"),
      col("neighbor_id").as("n2"))
    val recall = brute
      .join(ivfpq, col("query_id") === col("q2") &&
        col("neighbor_id") === col("n2"), "left")
      .agg((count(col("n2")).cast("double") / count(lit(1))).as("r"))
      .collect()(0).getDouble(0)
    info(s"ivfpq recall@${Similarity.TopK} on sf0.001 = $recall")
    assert(recall >= 0.8, "trained-codebook + pruning floor (r14)")
  }
}
