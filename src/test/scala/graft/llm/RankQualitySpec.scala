package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the ranking-quality eval ([[Similarity.rankQualityOf]], r13)
  * against hand-computed MRR/NDCG on planted rankings: a perfect
  * ranking scores 1.0/1.0, a reversed one keeps MRR=1 but loses NDCG
  * (the order penalty recall@k cannot see), a total miss scores 0 with
  * NULL first-hit, and a late first hit gets the reciprocal rank. */
class RankQualitySpec extends SparkSpec {
  import spark.implicits._

  private val K = Similarity.TopK // 5
  private def disc(r: Int): Double = Similarity.ndcgDiscounts(r - 1)

  // ideal for query 1: neighbors 100..104 with gains 5..1
  private val ideal = (1 to K).map(r => (1L, (99 + r).toLong, (K + 1 - r).toLong))

  private val ranked = Seq(
    "perfect" -> (1 to K).map(r => (99 + r).toLong),
    "reversed" -> (1 to K).map(r => (105 - r).toLong),
    "miss" -> (1 to K).map(r => (199 + r).toLong),
    "late" -> Seq(200L, 201L, 100L, 202L, 203L)
  ).flatMap { case (m, ns) =>
    ns.zipWithIndex.map { case (n, i) => (m, 1L, n, i + 1) }
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("MRR and NDCG match hand computation on planted rankings") {
    val got = Similarity.rankQualityOf(
      ranked.toDF("method", "query_id", "neighbor_id", "rnk"),
      ideal.toDF("query_id", "neighbor_id", "gain"))
      .collect()
      .map(r => r.getString(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getDouble(3),
          r.getDouble(4)))
      .toMap

    val idcg = Similarity.ndcgIdeal
    assert(got("perfect") == (Some(1L), 1.0, 1.0))

    // reversed: gains (1,2,3,4,5) at ranks 1..5
    val revDcg = (1 to K).map(r => r.toDouble * disc(r)).sum
    assert(got("reversed") == (Some(1L), 1.0, r6(revDcg / idcg)))
    assert(got("reversed")._3 < 1.0, "order penalty visible")

    assert(got("miss") == (None, 0.0, 0.0))

    // late: the only hit is gain-5 neighbor 100 at rank 3
    assert(got("late") ==
      (Some(3L), r6(1.0 / 3), r6(5.0 * disc(3) / idcg)))
  }
}
