package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Corpus.dsirSelectOf]] (DSIR importance resampling) BIT-LOCKSTEP
  * against a plain-Scala brute twin of the same hashed-bucket models,
  * Gumbel keys, and percentile cut — plus the behavior that makes it a
  * selector: raw docs written in target vocabulary out-score raw docs in
  * raw-exclusive vocabulary, target docs never appear in the pool, and
  * the keep count honors the cut. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // src0/src1 ∈ NbTargetSources; srcX/srcY are the raw pool. Raw docs
  // 10-12 reuse the target vocabulary; 13-16 use raw-exclusive words.
  private val corpus = Seq(
    (1L, "src0", "alpha beta gamma alpha"),
    (2L, "src0", "beta gamma delta"),
    (3L, "src1", "alpha delta beta gamma"),
    (10L, "srcX", "alpha beta gamma"),
    (11L, "srcX", "beta gamma delta alpha"),
    (12L, "srcY", "alpha beta"),
    (13L, "srcX", "zork quux blarg"),
    (14L, "srcY", "quux zork zork"),
    (15L, "srcX", "blarg blarg quux zork"),
    (16L, "srcY", "zork"))

  private def run(rows: Seq[(Long, String, String)], parts: Int = 1)
      : Seq[(Long, Long, Double, Double, Boolean)] =
    Corpus.dsirSelectOf(rows.toDF("doc_id", "source", "text")
        .repartition(parts))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))
      .toSeq

  /** [[Text.hash64]] twin: first 15 hex chars of the md5 as a long. */
  private def h64(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def brute(rows: Seq[(Long, String, String)])
      : Seq[(Long, Long, Double, Double, Boolean)] = {
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val b = Corpus.DsirBuckets
    val isT = (src: String) => TextAnalysis.NbTargetSources.contains(src)
    def grams(text: String): Seq[String] = {
      val t = text.split(" ", -1).toSeq
      t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val occ = rows.flatMap { case (id, src, text) =>
      grams(text).map(g => (id, isT(src), h64(g) % b))
    }
    val ct = occ.groupBy(_._3).map { case (bk, xs) =>
      bk -> (xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }
    val totT = ct.values.map(_._1).sum
    val totR = ct.values.map(_._2).sum
    val w = ct.map { case (bk, (a, c)) =>
      bk -> r(math.log((a + 1).toDouble / (totT + b)) -
        math.log((c + 1).toDouble / (totR + b)), 9)
    }
    val pool = rows.filter(x => !isT(x._2)).map { case (id, _, text) =>
      val bs = grams(text).map(g => h64(g) % b)
      val sdec = bs.map(bk => BigDecimal(w(bk)).setScale(9)).sum
      val logw = r(sdec.toDouble, 6)
      val u = (h64(s"dsir|$id") % 1000000L + 0.5) / 1000000.0
      val gkey = r(logw + r(-math.log(-math.log(u)), 9), 6)
      (id, bs.size.toLong, logw, gkey)
    }
    // exact type-7 percentile at 0.75 over the pool keys, rounded to 4 dp
    val ks = pool.map(_._4).sorted
    val pos = (ks.size - 1) * (1 - Corpus.DsirKeepFrac)
    val (lo, frac) = (pos.toInt, pos - pos.toInt)
    val cut = r(if (lo + 1 < ks.size) ks(lo) + frac * (ks(lo + 1) - ks(lo))
      else ks(lo), 4)
    pool.map { case (id, n, logw, gkey) => (id, n, logw, gkey, gkey >= cut) }
      .sortBy(_._1)
  }

  test("bit-lockstep with the plain-Scala brute twin") {
    assert(run(corpus) === brute(corpus))
  }

  test("target-vocabulary raw docs out-rank raw-vocabulary ones") {
    val out = run(corpus).map(t => t._1 -> t).toMap
    // target docs never enter the pool
    assert(!out.contains(1L) && !out.contains(2L) && !out.contains(3L))
    val targetLike = Seq(10L, 11L, 12L).map(out(_)._3)
    val rawLike = Seq(13L, 14L, 15L, 16L).map(out(_)._3)
    assert(targetLike.min > rawLike.max)
    // with a 0.25 keep fraction over 7 pool docs the cut keeps ≤ 3 and
    // ≥ 1, and every kept doc's key clears every dropped doc's key
    val (kept, dropped) = run(corpus).partition(_._5)
    assert(kept.nonEmpty && kept.size <= 3)
    assert(kept.map(_._4).min >= dropped.map(_._4).max)
  }

  test("decimal sum + percentile cut are partitioning-independent") {
    assert(run(corpus, parts = 7) === run(corpus, parts = 1))
  }
}
