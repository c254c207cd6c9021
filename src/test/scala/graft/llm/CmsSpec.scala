package graft.llm

import java.security.MessageDigest

import graft.SparkSpec

/** Pins [[TextAnalysis.cmsFrom]] (count-min sketch heavy hitters)
  * BIT-LOCKSTEP against a plain-Scala brute twin of the same salted-hash
  * grid, plus the published invariants: estimates never underestimate,
  * a token colliding with nothing in some row is estimated EXACTLY, and
  * the cell sums are partitioning-independent. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val vocab: Seq[(String, Long)] = Seq(
    "alpha" -> 100L, "beta" -> 60L, "gamma" -> 30L, "delta" -> 10L,
    "eps" -> 9L, "zeta" -> 8L, "eta" -> 7L, "theta" -> 3L, "iota" -> 1L)

  private def run(rows: Seq[(String, Long)], parts: Int = 1)
      : Seq[(String, Long, Long, Long)] =
    TextAnalysis.cmsFrom(rows.toDF("token", "term_freq").repartition(parts))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  private def h64(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def brute(rows: Seq[(String, Long)])
      : Seq[(String, Long, Long, Long)] = {
    val d = TextAnalysis.CmsDepth
    val w = TextAnalysis.CmsWidth
    def b(j: Int, t: String): Long = h64(s"cms$j|$t") % w
    val cells = (for {
      (t, f) <- rows; j <- 0 until d
    } yield ((j, b(j, t)), f)).groupBy(_._1).view.mapValues(_.map(_._2).sum)
    rows.sortBy { case (t, f) => (-f, t) }.take(TextAnalysis.CmsTopK)
      .map { case (t, f) =>
        val est = (0 until d).map(j => cells((j, b(j, t)))).min
        (t, f, est, est - f)
      }
  }

  test("bit-lockstep with the plain-Scala brute twin") {
    assert(run(vocab) === brute(vocab))
  }

  test("never underestimates; lone-bucket tokens are exact") {
    val out = run(vocab)
    assert(out.forall(_._4 >= 0L))
    // with 9 tokens in a 4x256 grid at least one token avoids every
    // collision in some row -> exact estimate; and the top token's
    // estimate is at least its exact count
    assert(out.exists(_._4 === 0L))
    assert(out.head._1 === "alpha" && out.head._3 >= 100L)
  }

  test("cell sums are partitioning-independent") {
    assert(run(vocab, parts = 5) === run(vocab, parts = 1))
  }
}
