package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the KMV / bottom-k distinct sketch (r18,
  * TextAnalysis.kmvDistinctOf): the exact small-group branch, the
  * estimator arithmetic, the two-level tournament's exactness, and
  * mergeability — the properties that make bottom-k the distributed
  * distinct-count currency. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(rows: Seq[(String, String)]) =
    TextAnalysis.kmvDistinctOf(rows.toDF("source", "text"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("a group under k distinct tokens reports its exact count") {
    val got = sketch(Seq(
      ("tiny", "alpha beta gamma"),
      ("tiny", "beta delta")))
    val (exact, _, est) = got("tiny")
    assert(exact == 4L && est == 4L,
      s"under-k groups are exact by the published rule, got $got")
  }

  test("estimator arithmetic matches (k-1)*2^60/h_k; tournament is exact") {
    // one source, 5000 distinct tokens — far past k
    val docs = (0 until 50).map(i =>
      ("big", (0 until 100).map(j => s"tok_${i}_$j").mkString(" ")))
    val got = sketch(docs)
    val (exact, kth, est) = got("big")
    assert(exact == 5000L)
    assert(est == math.floor(
      (TextAnalysis.KmvK - 1).toDouble * math.pow(2.0, 60) / kth).toLong,
      "the estimate must be the bottom-k formula over the reported h_k")
    // ~18 % expected relative error at k=32; 2.5x that is a safe
    // deterministic bound for THIS fixture (the value is seed-free and
    // reproducible — this pin fails only if the hash or take changes)
    assert(math.abs(est - exact).toDouble / exact < 0.45,
      s"estimate $est implausibly far from $exact")
    // the two-level tournament returned the TRUE k-th minimum: recompute
    // brute over all hashes
    val brute = (0 until 50).flatMap(i => (0 until 100).map(j => s"tok_${i}_$j"))
      .distinct.toDF("tok")
      .select(Text.hash64(concat(lit("kmv|"), col("tok"))).as("h"))
      .orderBy(col("h")).limit(TextAnalysis.KmvK)
      .agg(max(col("h"))).head().getLong(0)
    assert(kth == brute, "tournament k-th minimum must equal the brute one")
  }

  test("mergeable: re-taking bottom-k of two sketches' unions = direct") {
    def bottomK(tokens: Seq[String]): Seq[Long] =
      tokens.distinct.toDF("tok")
        .select(Text.hash64(concat(lit("kmv|"), col("tok"))).as("h"))
        .orderBy(col("h")).limit(TextAnalysis.KmvK)
        .as[Long].collect().toSeq
    val a = (0 until 2000).map(i => s"a_$i")
    val b = (0 until 2000).map(i => s"b_$i") ++ a.take(500) // overlap
    val merged = (bottomK(a) ++ bottomK(b)).distinct.sorted
      .take(TextAnalysis.KmvK)
    val direct = bottomK(a ++ b).sorted
    assert(merged == direct,
      "union of sketches re-taken must equal the union's direct sketch")
  }
}
