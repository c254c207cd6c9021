package graft.llm

import graft.SparkSpec

/** Pins [[Dedup.clustersTwoStarOf]] (alternating large-star/small-star
  * connected components) against [[Dedup.clustersOf]] (min-label
  * propagation): identical fixpoint on hand-built shapes — transitive
  * triangles, deep chains (the case two-star exists for), stars, the
  * empty graph — and on randomized graphs. */
class TwoStarSpec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Boolean)] =
    Dedup.clustersTwoStarOf(pairs.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq

  private def runBaseline(pairs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Boolean)] =
    Dedup.clustersOf(pairs.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq

  test("three components with a transitive triangle — equals propagation") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
    assert(run(pairs) === runBaseline(pairs))
  }

  test("a diameter-15 chain (the adversarial case) collapses to one cluster") {
    val chain = (1L until 16L).map(i => (i, i + 1))
    val out = run(chain)
    assert(out.map(_._1).distinct === Seq(1L))
    assert(out.map(_._2) === (1L to 16L))
    assert(out.forall(_._3 == 16L))
    assert(out.count(_._4) === 1)
  }

  test("reversed/duplicated/self edges normalize away") {
    // same component presented messily: reversed orientation, dup edges,
    // a self loop
    val pairs = Seq((2L, 1L), (1L, 2L), (3L, 2L), (3L, 3L))
    assert(run(pairs) === runBaseline(Seq((1L, 2L), (2L, 3L))))
  }

  test("empty pair graph => empty clustering") {
    assert(run(Seq.empty) === Seq.empty)
  }

  test("matches propagation on 60 random edges over 40 vertices") {
    val rnd = new scala.util.Random(4242)
    val pairs = Seq.fill(60) {
      val a = rnd.nextInt(40).toLong + 1
      val b = rnd.nextInt(40).toLong + 1
      (a, b)
    }.filter(p => p._1 != p._2)
    assert(run(pairs) === runBaseline(pairs))
  }

  test("matches propagation on a corpus-shaped graph (cliques + chains)") {
    val clique = for {
      a <- 100L to 105L; b <- 100L to 105L if a < b
    } yield (a, b)
    val chain = (200L until 210L).map(i => (i, i + 1))
    val bridge = Seq((105L, 200L))
    val pairs = (clique ++ chain ++ bridge).toSeq
    assert(run(pairs) === runBaseline(pairs))
  }
}
