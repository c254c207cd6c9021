package graft.llm

import graft.SparkSpec

/** Pins [[PageRank]] against a plain-Scala brute twin running the SAME
  * recurrence with the SAME rounding (12-dp decimal-summed
  * contributions/dangling mass, 9-dp ranks) on an irregular hand graph —
  * chain + triangle + hub + three dangling nodes — then structural
  * invariants: total mass ≈ 1, symmetric vertices tie, dangling nodes sit
  * at the uniform floor, and the operator is deterministic. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def r(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The operator's recurrence, sequentially, exact decimal sums. */
  private def brute(vertices: Seq[Long], pairs: Seq[(Long, Long)],
      rounds: Int): Map[Long, Double] = {
    val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n = vertices.size
    var rank = vertices.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to rounds) {
      val cin = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          BigDecimal(r(rank(src) / deg(src), 12)) }.sum.toDouble
      }
      val dm = vertices.filterNot(deg.contains)
        .map(k => BigDecimal(r(rank(k), 12))).sum.toDouble
      rank = vertices.map { k =>
        k -> r(0.15 / n + 0.85 * (cin.getOrElse(k, 0.0) + dm / n), 9)
      }.toMap
    }
    rank
  }

  test("bit-lockstep with the brute twin on an irregular graph") {
    val vs = (0L to 9L)
    // chain 0-1-2, triangle 2-3-4-2, hub 5 to {0, 3}; 6..9 dangling
    val pairs = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 2L,
      5L -> 0L, 5L -> 3L)
    val want = brute(vs, pairs, PageRank.Rounds)
    val got = PageRank.pagerankOf(
      vs.toDF("doc_id"),
      pairs.toDF("doc_a", "doc_b")).collect()
    assert(got.length == 10)
    got.foreach { row =>
      val (id, rank) = (row.getLong(0), row.getDouble(2))
      assert(math.abs(rank - want(id)) < 1e-12,
        s"doc $id: got $rank want ${want(id)}")
    }
  }

  test("mass conservation, symmetry, dangling floor, determinism") {
    // two symmetric leaves on one hub + two dangling docs
    val vs = (0L to 4L)
    val pairs = Seq(0L -> 1L, 0L -> 2L)
    val out = PageRank.pagerankOf(vs.toDF("doc_id"),
      pairs.toDF("doc_a", "doc_b")).collect()
    val ranks = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6,
      s"mass ${ranks.values.sum}")
    assert(ranks(1L) == ranks(2L), "symmetric leaves must tie")
    assert(ranks(0L) > ranks(1L), "hub outranks leaf")
    assert(ranks(3L) == ranks(4L), "dangling nodes must tie")
    assert(ranks(1L) > ranks(3L), "linked leaf outranks dangling")
    val again = PageRank.pagerankOf(vs.toDF("doc_id"),
      pairs.toDF("doc_a", "doc_b")).collect()
    assert(out.map(_.toSeq).sameElements(again.map(_.toSeq)))
  }

  test("corpus entry: mass ≈ 1 and clustered docs outrank the floor") {
    val out = PageRank.pagerank(spark, sf001).collect()
    val mass = out.map(_.getDouble(2)).sum
    assert(math.abs(mass - 1.0) < 1e-5, s"mass $mass")
    val (linked, dangling) = out.partition(_.getLong(1) > 0)
    if (linked.nonEmpty) {
      val floor = dangling.map(_.getDouble(2)).max
      assert(linked.map(_.getDouble(2)).max > floor,
        "no linked doc outranks the dangling floor")
    }
  }
}
