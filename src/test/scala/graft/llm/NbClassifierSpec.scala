package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[TextAnalysis.nbQualityClassifierOf]] BIT-LOCKSTEP against a
  * plain-Scala brute twin of the same add-one-smoothed multinomial NB
  * recurrence (the PageRankSpec discipline), plus the discriminative
  * behavior that makes the operator a quality filter: target-exclusive
  * vocabulary drives the score positive, other-exclusive negative, and
  * the decimal contribution sum is partitioning-independent. */
class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  // (doc_id, source, text) — src0/src1 are in NbTargetSources, srcX not
  private val corpus = Seq(
    (1L, "src0", "wiki wiki clean prose and prose"),
    (2L, "src1", "clean prose citation"),
    (3L, "srcX", "spam spam buy now buy"),
    (4L, "srcX", "buy spam and wiki"),
    (5L, "srcY", "now buy spam spam spam"))

  private def run(rows: Seq[(Long, String, String)],
      parts: Int = 1): Seq[(Long, String, Long, Double, String)] = {
    val labels = rows.map { case (id, src, _) => (id, src) }
      .toDF("doc_id", "source")
    val tf = rows.map { case (id, _, text) => (id, text) }
      .toDF("doc_id", "text")
      .repartition(parts)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    TextAnalysis.nbQualityClassifierOf(labels, tf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))
      .toSeq
  }

  /** The same recurrence in plain Scala with the same 9/6-dp HALF_UP
    * rounding and exact-decimal contribution sum. */
  private def brute(rows: Seq[(Long, String, String)])
      : Seq[(Long, String, Long, Double, String)] = {
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val isT = (src: String) => TextAnalysis.NbTargetSources.contains(src)
    val tf = rows.flatMap { case (id, _, text) =>
      text.split(" ", -1).toSeq.map(t => (id, t))
    }.groupBy(identity).map { case ((id, t), xs) => (id, t, xs.size.toLong) }
      .toSeq
    val lab = rows.map { case (id, src, _) => id -> isT(src) }.toMap
    val ct = tf.groupBy(_._2).map { case (t, xs) =>
      t -> (xs.filter(x => lab(x._1)).map(_._3).sum,
        xs.filter(x => !lab(x._1)).map(_._3).sum)
    }
    val totT = ct.values.map(_._1).sum
    val totO = ct.values.map(_._2).sum
    val v = ct.size
    val w = ct.map { case (t, (a, b)) =>
      t -> r(math.log((a + 1).toDouble / (totT + v)) -
        math.log((b + 1).toDouble / (totO + v)), 9)
    }
    val nT = lab.values.count(identity)
    val w0 = r(math.log(nT.toDouble / (lab.size - nT)), 9)
    rows.map { case (id, src, _) =>
      val mine = tf.filter(_._1 == id)
      val sdec = mine.map(x =>
        BigDecimal(w(x._2)).setScale(9) * BigDecimal(x._3)).sum
      val score = r(sdec.toDouble + w0, 6)
      (id, if (isT(src)) "target" else "other", mine.map(_._3).sum, score,
        if (score > 0) "target" else "other")
    }.sortBy(_._1)
  }

  test("bit-lockstep with the plain-Scala brute twin") {
    assert(run(corpus) === brute(corpus))
  }

  test("discriminative vocabulary drives prediction through zero") {
    val out = run(corpus).map(t => t._1 -> t).toMap
    // docs 1-2 are pure target vocabulary -> positive score, pred target;
    // docs 3/5 are pure other vocabulary -> negative, pred other
    assert(out(1L)._4 > 0 && out(1L)._5 === "target")
    assert(out(2L)._4 > 0 && out(2L)._5 === "target")
    assert(out(3L)._4 < 0 && out(3L)._5 === "other")
    assert(out(5L)._4 < 0 && out(5L)._5 === "other")
    // weak labels stay honest in the output
    assert(out(3L)._2 === "other" && out(1L)._2 === "target")
  }

  test("decimal contribution sum is partitioning-independent") {
    assert(run(corpus, parts = 7) === run(corpus, parts = 1))
  }
}
