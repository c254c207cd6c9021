package graft.llm

import graft.SparkSpec

/** Pins [[Dedup.clustersOf]] (connected components via min-label
  * propagation): hand-built components, a long chain that forces multiple
  * propagation rounds, the empty graph, and a randomized cross-check
  * against a sequential union-find. */
class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  private def clustersOf(pairs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Boolean)] =
    Dedup.clustersOf(pairs.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq

  test("three components with a transitive (non-pairwise-complete) triangle") {
    // {1,2,3} is closed only transitively: 1~2 and 2~3 without a 1~3 pair
    val out = clustersOf(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L)))
    assert(out === Seq(
      (1L, 1L, 3L, true), (1L, 2L, 3L, false), (1L, 3L, 3L, false),
      (10L, 10L, 2L, true), (10L, 11L, 2L, false),
      (20L, 20L, 3L, true), (20L, 21L, 3L, false), (20L, 22L, 3L, false)))
  }

  test("a diameter-7 chain converges (multiple propagation rounds)") {
    val chain = (1L until 8L).map(i => (i, i + 1))
    val out = clustersOf(chain)
    assert(out.map(_._1).distinct === Seq(1L))
    assert(out.map(_._2) === (1L to 8L))
    assert(out.forall(_._3 == 8L))
    assert(out.count(_._4) === 1)
  }

  test("empty pair graph => empty clustering") {
    assert(clustersOf(Seq.empty) === Seq.empty)
  }

  test("matches a sequential union-find on 60 random edges over 40 vertices") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(60) {
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
      if (a < b) (a, b) else (b, a)
    }.filter(e => e._1 != e._2).distinct

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byComp = verts.groupBy(find).toSeq
    val expected = byComp
      .map { case (_, vs) => (vs.min, vs.sorted) }
      .sortBy(_._1)
      .flatMap { case (cid, vs) =>
        vs.map(v => (cid, v, vs.size.toLong, v == cid))
      }
    assert(clustersOf(edges) === expected)
  }
}
