package graft.llm

import graft.SparkSpec

/** Pins [[Corpus.domainReweightOf]] (DoReMi-style Group-DRO
  * multiplicative weights, Xie et al. 2023) BIT-LOCKSTEP against a
  * plain-Scala brute twin of the same recurrence — surprisal loss proxy
  * (9-dp contributions, decimal sums, 6-dp means), excess over the
  * mixture loss, 9-dp-rounded Hedge step exp(η·excess), uniform
  * smoothing — round by round on a hand fixture, plus the structural
  * invariants: weights sum to 1 every round, the highest-loss domain
  * gains weight, and the trajectory is deterministic. */
class DoremiSpec extends SparkSpec {
  import spark.implicits._

  private def r(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The operator's full recurrence, sequentially: loss proxy from the
    * texts, then DoremiRounds rounds of (excess, hedge, smooth). Returns
    * round -> source -> (loss, excess, alpha). */
  private def brute(rows: Seq[(Long, String, String)])
      : Map[Int, Map[String, (Double, Double, Double)]] = {
    val tf = rows.flatMap { case (_, src, text) =>
      text.split(" ", -1).map(t => (src, t))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val termFreq = tf.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
    val total = termFreq.values.sum.toDouble
    val sources = tf.keys.map(_._1).toSeq.distinct.sorted
    val loss = sources.map { s =>
      val mine = tf.filter(_._1._1 == s)
      val n = mine.values.sum
      val sum = mine.map { case ((_, t), c) =>
        BigDecimal(r(c * -math.log(termFreq(t) / total), 9))
      }.sum.toDouble
      s -> r(sum / n, 6)
    }.toMap
    val k = sources.size
    var alpha = sources.map(s => s -> r(1.0 / k, 9)).toMap
    (1 to Corpus.DoremiRounds).map { t =>
      val lam = sources.map(s => BigDecimal(r(alpha(s) * loss(s), 9)))
        .sum.toDouble
      val excess = sources.map(s =>
        s -> r(math.max(loss(s) - lam, 0.0), 9)).toMap
      val u = sources.map(s =>
        s -> r(alpha(s) * r(math.exp(Corpus.DoremiEta * excess(s)), 9), 9))
        .toMap
      val sS = sources.map(s => BigDecimal(u(s))).sum.toDouble
      alpha = sources.map(s => s -> r(
        (1.0 - Corpus.DoremiSmooth) * r(u(s) / sS, 9) +
          Corpus.DoremiSmooth / k, 9)).toMap
      t -> sources.map(s => s -> ((loss(s), excess(s), alpha(s)))).toMap
    }.toMap
  }

  // three domains with clearly separated surprisal: srcA repeats one
  // common token (low loss), srcB is all-rare (high loss), srcC mixes
  private val fixture = Seq(
    (1L, "srcA", "a a a a a a"),
    (2L, "srcA", "a a a b"),
    (3L, "srcB", "q w e r t y"),
    (4L, "srcC", "a a q w"))

  private lazy val got = Corpus.domainReweightOf(
      fixture.toDF("doc_id", "source", "text"))
    .collect()
    .map(row => (row.getAs[Int]("round"), row.getAs[String]("source")) ->
      ((row.getAs[Double]("loss"), row.getAs[Double]("excess"),
        row.getAs[Double]("alpha"))))
    .toMap

  test("bit-lockstep with the brute twin, every round") {
    val want = brute(fixture)
    assert(got.size == Corpus.DoremiRounds * 3)
    for (t <- 1 to Corpus.DoremiRounds; s <- Seq("srcA", "srcB", "srcC")) {
      val (wl, we, wa) = want(t)(s)
      val (gl, ge, ga) = got((t, s))
      assert(math.abs(gl - wl) < 1e-12, s"round $t $s loss: $gl vs $wl")
      assert(math.abs(ge - we) < 1e-12, s"round $t $s excess: $ge vs $we")
      assert(math.abs(ga - wa) < 1e-12, s"round $t $s alpha: $ga vs $wa")
    }
  }

  test("weights sum to 1 every round; worst domain gains weight") {
    for (t <- 1 to Corpus.DoremiRounds) {
      val mass = Seq("srcA", "srcB", "srcC").map(s => got((t, s))._3).sum
      assert(math.abs(mass - 1.0) < 1e-8, s"round $t mass $mass")
    }
    // srcB (all rare tokens) is the highest-loss domain: its weight must
    // rise above uniform and keep rising across the trajectory
    val uniform = 1.0 / 3
    assert(got((1, "srcB"))._3 > uniform)
    assert(got((Corpus.DoremiRounds, "srcB"))._3 > got((1, "srcB"))._3)
    assert(got((Corpus.DoremiRounds, "srcA"))._3 < uniform)
  }

  test("deterministic across executions") {
    val again = Corpus.domainReweightOf(
        fixture.toDF("doc_id", "source", "text"))
      .collect().map(_.toSeq)
    val first = Corpus.domainReweightOf(
        fixture.toDF("doc_id", "source", "text"))
      .collect().map(_.toSeq)
    assert(again.sameElements(first))
  }
}
