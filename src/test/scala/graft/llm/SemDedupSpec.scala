package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the SemDeDup contract ([[Similarity.semDedupOf]], r13):
  *
  *  - the E-step assignment (nearest centroid by 6-dp cosine, cent_id
  *    tiebreak) and the retained centroid_sim values;
  *  - keep-priority = LOW centroid cosine first, then low vec_id (the
  *    paper's diversity rule);
  *  - "dominated by ANY near neighbor", NOT iterative NMS and NOT
  *    connected components: in the chain a–b–c (edges a–b and b–c only,
  *    priority a > b > c) vector c is DROPPED even though its only
  *    dominator b was itself dropped;
  *  - exact-tie duplicates: equal csim falls to the vec_id tiebreak —
  *    lower id kept;
  *  - cross-cluster blindness: a near-dup pair straddling the centroid
  *    boundary is untouched (SemDeDup's published trade-off vs the
  *    LSH-probed [[Similarity.embeddingNearDups]]);
  *  - isolated vectors keep with n_near = 0.
  *
  * All expectations come from a Scala brute-force twin over the fixture,
  * so the suite certifies semantics, not transcribed numbers.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Base = 100
  private val K = 2
  private val Tau = 0.995

  private def deg(d: Double): Double = math.toRadians(d)

  /** Unit vector at angle θ in the e1–e2 plane (4 dims). */
  private def ang(d: Double): Array[Float] =
    Array(math.cos(deg(d)).toFloat, math.sin(deg(d)).toFloat, 0f, 0f)

  // centroids: c0 = e1 (id 100), c1 = e2 (id 101); τ = 0.995 ≈ cos(5.7°)
  // chain in cluster 0: a(id 0)=10°, b(id 1)=5°, c(id 2)=0° —
  //   cos(a,b)=cos(b,c)=cos5°≈0.9962 ≥ τ, cos(a,c)=cos10°≈0.9848 < τ;
  //   csim: a≈0.9848 (best priority), b≈0.9962, c=1.0
  // boundary pair: u(id 3)=44° → c0, w(id 4)=46° → c1, cos(u,w)≈0.9994 ≥ τ;
  //   both ≥ 34° from every same-cluster vector (cos34°≈0.829 < τ)
  // exact tie in cluster 1: p(id 10) = q(id 11) = 80°
  // isolated in cluster 1: iso(id 12) = 60° — nearest same-cluster vector
  //   is w at 14° (cos14°≈0.970 < τ)
  private lazy val vectors: Seq[(Long, Array[Float])] = Seq(
    0L -> ang(10), 1L -> ang(5), 2L -> ang(0),
    3L -> ang(44), 4L -> ang(46),
    10L -> ang(80), 11L -> ang(80), 12L -> ang(60),
    Base.toLong -> ang(0), (Base + 1).toLong -> ang(90))

  /** Scala twin of [[Similarity.cosine]]: sequential double fold, 6-dp. */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Brute-force reference: assignment + dominance over the full matrix. */
  private lazy val expected: Map[Long, (Long, Double, Long, Boolean)] = {
    val m = vectors.toMap
    val cents = (0 until K).map(k => (Base + k).toLong -> m((Base + k).toLong))
    val asg = vectors.map { case (id, v) =>
      val (cid, cs) = cents
        .map { case (cid, cv) => (cid, cos(v, cv)) }
        .maxBy { case (cid, cs) => (cs, -cid) }
      id -> (cid, cs)
    }.toMap
    vectors.map { case (id, v) =>
      val (cid, cs) = asg(id)
      val near = vectors.filter { case (oid, ov) =>
        oid != id && asg(oid)._1 == cid && cos(v, ov) >= Tau
      }
      val dominated = near.exists { case (oid, _) =>
        val ocs = asg(oid)._2
        ocs < cs || (ocs == cs && oid < id)
      }
      id -> (cid, cs, near.size.toLong, !dominated)
    }.toMap
  }

  private lazy val result: Map[Long, (Long, Double, Long, Boolean)] = {
    val e = vectors.toDF("vec_id", "embedding")
    val asg = Similarity.semAssignOf(e, Base, K)
    Similarity.semDedupOf(asg, Tau)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4)))
      .toMap
  }

  test("every vector's (cluster, centroid_sim, n_near, kept) matches the brute-force twin") {
    assert(result.keySet == vectors.map(_._1).toSet)
    for ((id, want) <- expected) assert(result(id) == want, s"vec $id")
  }

  test("chain: c is dropped although its only dominator b was itself dropped") {
    // the fixture is only evidence if the chain shape actually holds
    val m = vectors.toMap
    assert(cos(m(0L), m(1L)) >= Tau && cos(m(1L), m(2L)) >= Tau)
    assert(cos(m(0L), m(2L)) < Tau)
    assert(result(0L)._4, "a: best priority, kept")
    assert(!result(1L)._4, "b: dominated by a")
    assert(!result(2L)._4, "c: dominated by already-dropped b")
  }

  test("cross-cluster near-dup pair is blind: both kept, zero near counts") {
    val m = vectors.toMap
    assert(cos(m(3L), m(4L)) >= Tau)
    assert(result(3L)._1 != result(4L)._1, "straddles the boundary")
    assert(result(3L) == (result(3L)._1, result(3L)._2, 0L, true))
    assert(result(4L) == (result(4L)._1, result(4L)._2, 0L, true))
  }

  test("exact tie falls to the id tiebreak: lower vec_id kept") {
    assert(result(10L)._2 == result(11L)._2)
    assert(result(10L)._4 && !result(11L)._4)
  }

  test("isolated vector keeps with n_near = 0") {
    assert(result(12L) == (result(12L)._1, result(12L)._2, 0L, true))
  }
}
