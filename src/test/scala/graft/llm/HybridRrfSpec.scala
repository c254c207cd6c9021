package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Similarity.hybridRrf]] by recomputing the fusion from its two
  * public legs: the BM25 top-k ranking and an independently-ranked exact
  * cosine leg. Every fused row must carry exactly the leg ranks the legs
  * themselves produce, and the RRF score must equal the closed-form sum. */
class HybridRrfSpec extends SparkSpec {

  test("fusion equals closed-form recombination of the two legs") {
    val lex = Corpus.bm25TopK(spark, sf001)
      .select(col("doc_id"), col("rnk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent semantic leg: brute cosine vs the query vector, ranked
    // by (rounded cosine desc, id) like the operator under test
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val qv = e.where(col("vec_id") === Similarity.HybridQueryVec)
      .select(col("embedding")).collect().head.getSeq[Float](0)
    val sem = e.where(col("vec_id") =!= Similarity.HybridQueryVec)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val dot = qv.zip(v).map { case (a, b) => a.toDouble * b.toDouble }.sum
        def nrm(x: Seq[Float]) = math.sqrt(x.map(f => f.toDouble * f.toDouble).sum)
        val cos = BigDecimal(dot / (nrm(qv) * nrm(v)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (r.getLong(0), cos)
      }
      .sortBy { case (id, cos) => (-cos, id) }
      .take(Similarity.HybridTopK).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap

    val fused = Similarity.hybridRrf(spark, sf001).collect()
    assert(fused.nonEmpty)
    assert(fused.map(_.getLong(0)).toSet === (lex.keySet ++ sem.keySet))
    fused.foreach { r =>
      val id = r.getLong(0)
      assert(Option(r.get(1)).map(_.asInstanceOf[Long]) === lex.get(id), s"lex_rank doc $id")
      assert(Option(r.get(2)).map(_.asInstanceOf[Long]) === sem.get(id), s"sem_rank doc $id")
      val want = BigDecimal(
        lex.get(id).map(x => 1.0 / (Similarity.RrfK + x)).getOrElse(0.0) +
          sem.get(id).map(x => 1.0 / (Similarity.RrfK + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === want, s"rrf_score doc $id")
    }
    // output is ranked: fusion score non-increasing, id tiebreak ascending
    val scores = fused.map(r => (r.getDouble(3), r.getLong(0)))
    assert(scores === scores.sortBy { case (sc, id) => (-sc, id) }.toSeq)
  }
}
