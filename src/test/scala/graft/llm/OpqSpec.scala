package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the OPQ pre-transform ([[Similarity.opqEmbOf]], Ge et al. 2014):
  * the signed Hadamard factor is genuinely ORTHOGONAL (norms survive the
  * rotation to within the 6-dp materialization rounding), the
  * eigenvalue-allocation step is a true PERMUTATION of the 64 dimensions
  * (a bijection — anything else would drop or duplicate coordinates),
  * the snake deal BALANCES per-subspace variance at least as well as
  * contiguous slicing (the imbalance OPQ exists to remove), and the
  * end-to-end tier's recall on the real sf0.001 corpus is measured
  * against brute force next to plain PQ (the graded
  * similarity_ann_recall entry reports the per-scale values; at sf0.01
  * OPQ ≥ PQ is driver-gated through that entry's oracle). */
class OpqSpec extends SparkSpec {

  private lazy val e = spark.read.parquet(s"$sf001/embeddings.parquet")
  private lazy val rot = Similarity.opqRotatedOf(e).persist()
  private lazy val opq = Similarity.opqEmbOf(e).persist()

  test("the signed Hadamard rotation preserves norms (orthogonality)") {
    val drift = e.select(col("vec_id"), Similarity.norm(col("embedding")).as("n0"))
      .join(rot.select(col("vec_id"), Similarity.norm(col("embedding")).as("n1")),
        "vec_id")
      .agg(max(abs(col("n0") - col("n1"))).as("d"))
      .collect()(0).getDouble(0)
    info(f"max norm drift through the rotation: $drift%.6f")
    // 64 components each rounded to 6 dp -> norm drift bounded well
    // under 1e-3; a non-orthogonal transform would blow past this
    assert(drift < 1e-3)
  }

  test("eigenvalue allocation is a bijection on the 64 dimensions") {
    val perm = Similarity.opqPermOf(rot).collect()(0)
      .getAs[scala.collection.Seq[Int]]("perm")
    assert(perm.size == Similarity.Dims)
    assert(perm.toSet == (0 until Similarity.Dims).toSet,
      "permutation dropped or duplicated a dimension")
  }

  test("snake allocation balances per-subspace variance vs contiguous slicing") {
    // per-dimension variances of the rotated corpus, then the subspace
    // totals under (a) the snake permutation and (b) contiguous slices
    val d = Similarity.Dims
    val m = Similarity.PqSubspaces
    val sd = Similarity.PqSubDim
    val vars = rot.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg((sum(col("v") * col("v")) / count(lit(1)) -
        (sum(col("v")) / count(lit(1))) * (sum(col("v")) / count(lit(1))))
        .as("variance"))
      .collect().map(r => r.getAs[Int]("pos") -> r.getAs[Double]("variance"))
      .toMap
    val perm = Similarity.opqPermOf(rot).collect()(0)
      .getAs[scala.collection.Seq[Int]]("perm")
    // contiguous: subspace b holds rotated dims b*sd..b*sd+sd-1;
    // snake: subspace b holds newpos b*sd..b*sd+sd-1, whose variances
    // are vars(perm(newpos))
    val contiguousTotals = (0 until m).map(b =>
      (0 until sd).map(s => vars(b * sd + s)).sum)
    val snakeTotals = (0 until m).map(b =>
      (0 until sd).map(s => vars(perm(b * sd + s))).sum)
    val contiguous = contiguousTotals.max / contiguousTotals.min
    val snakeSpread = snakeTotals.max / snakeTotals.min
    info(f"subspace variance max/min: contiguous $contiguous%.4f, " +
      f"snake $snakeSpread%.4f")
    assert(snakeSpread <= contiguous + 1e-9,
      "eigenvalue allocation left MORE subspace imbalance than slicing")
    assert(d == m * sd)
  }

  test("opq recall@5 vs brute force is measured next to plain pq") {
    val brute = Similarity.bruteTopKOf(e)
      .select(col("query_id"), col("neighbor_id"))
    def recallOf(tier: org.apache.spark.sql.DataFrame): Double = {
      val t = tier.select(col("query_id").as("tq"),
        col("neighbor_id").as("tn"))
      brute.join(t, col("query_id") === col("tq") &&
          col("neighbor_id") === col("tn"), "left")
        .agg((count(col("tn")).cast("double") / count(lit(1))).as("r"))
        .collect()(0).getDouble(0)
    }
    val rOpq = recallOf(Similarity.opqTopKOf(e))
    val rPq = recallOf(Similarity.pqTopKOf(e,
      Similarity.pqTrainedCodebookOf(e), Similarity.QueryCount,
      Similarity.PqCandidates, Similarity.TopK))
    info(s"recall@${Similarity.TopK} on sf0.001: opq $rOpq, pq $rPq")
    assert(rOpq >= 0.8, "opq tier fell below the trained-PQ floor")
  }

  test("opq-ivf-adc composition: k rows per query, original-space cosines") {
    val out = Similarity.opqIvfAdcTopKOf(e)
    val perQuery = out.groupBy(col("query_id")).count().collect()
    assert(perQuery.length == Similarity.QueryCount)
    assert(perQuery.forall(_.getLong(1) == Similarity.TopK.toLong))
    // the rerank ran on the ORIGINAL vectors: every reported cosine must
    // equal the exact cosine recomputed from the raw embeddings
    val raw = e.select(col("vec_id"), col("embedding"))
    val recomputed = out
      .join(raw.select(col("vec_id").as("query_id"),
        col("embedding").as("qe")), "query_id")
      .join(raw.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ne")), "neighbor_id")
      .where(col("cosine") =!= Similarity.cosine(col("qe"), col("ne")))
      .count()
    assert(recomputed == 0L, "a cosine drifted from the original space")
    // deterministic
    assert(Similarity.opqIvfAdcTopKOf(e).collect().map(_.toSeq)
      .sameElements(out.collect().map(_.toSeq)))
  }
}
