package graft.llm

import graft.SparkSpec

/** Pins the contrastive-pair miner ([[Similarity.hardNegativesOf]], r13):
  * the positive is the same-label cosine argmax, negatives are the
  * top-k other-label cluster-mates (cosine desc, id tiebreak — exercised
  * by an exact two-way tie), an anchor without a same-label mate emits
  * no positive row, and a lone cluster member emits nothing. */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  private def ang(d: Double): Array[Float] = {
    val r = math.toRadians(d)
    Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f)
  }

  /** Scala twin of the 6-dp cosine. */
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

  // cluster 0: labels 0,0,1,1,2 at 0°,5°,10°,15°,20°; cluster 1: lone
  private val fixture: Seq[(Long, Long, Double, Array[Float], Int)] = Seq(
    (0L, 100L, 0.0, ang(0), 0),
    (1L, 100L, 0.0, ang(5), 0),
    (2L, 100L, 0.0, ang(10), 1),
    (3L, 100L, 0.0, ang(15), 1),
    (4L, 100L, 0.0, ang(20), 2),
    (9L, 101L, 0.0, ang(90), 0))

  private lazy val rows: Seq[(Long, String, Long, Long, Double)] =
    Similarity.hardNegativesOf(
      fixture.toDF("vec_id", "cent_id", "csim", "embedding", "label"),
      Similarity.HardNegatives)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq

  private def v(id: Long) = fixture.find(_._1 == id).get._4

  test("anchor 0: positive is its only same-label mate; negatives ranked by cosine") {
    assert(rows.filter(_._1 == 0L) == Seq(
      (0L, "neg", 1L, 2L, cos(v(0), v(2))),
      (0L, "neg", 2L, 3L, cos(v(0), v(3))),
      (0L, "neg", 3L, 4L, cos(v(0), v(4))),
      (0L, "pos", 1L, 1L, cos(v(0), v(1)))))
  }

  test("anchor 2: exact cosine tie between negatives falls to the lower id") {
    // a0 (10° away) and a4 (10° away) tie: id 0 ranks before id 4
    assert(cos(v(2), v(0)) == cos(v(2), v(4)))
    assert(rows.filter(r => r._1 == 2L && r._2 == "neg").map(_._4) ==
      Seq(1L, 0L, 4L))
  }

  test("anchor 4 has no same-label mate: no positive row") {
    assert(rows.filter(r => r._1 == 4L && r._2 == "pos").isEmpty)
    assert(rows.filter(r => r._1 == 4L && r._2 == "neg").map(_._4) ==
      Seq(3L, 2L, 1L))
  }

  test("a lone cluster member emits nothing") {
    assert(rows.filter(_._1 == 9L).isEmpty)
  }
}
