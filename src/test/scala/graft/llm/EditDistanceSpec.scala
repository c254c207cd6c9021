package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the EDIT-DISTANCE near-dup tier (r18, Dedup.editDistanceOf):
  * prefix-blocked candidates, the exact length-difference prune, and
  * the Levenshtein gate. The planted fixtures hand-pin known distances
  * and every pruning boundary. */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  // a 40-char shared opening — longer than EditPrefixChars, so all of
  // these block together
  private val head = "the quick brown fox jumps over the lazy "

  private def pairs(rows: Seq[(Long, String)]) =
    Dedup.editDistanceOf(rows.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().toSeq

  test("known distances: substitutions, insertions, equality") {
    val got = pairs(Seq(
      (1L, head + "dog again and again"),
      (2L, head + "dog again and AGAIN"), // 5 substitutions vs doc 1
      (3L, head + "dog again and again tail"), // +5 chars vs doc 1
      (4L, head + "dog again and again"))) // exact copy of doc 1
    assert(got == Seq(
      (1L, 2L, 5L), (1L, 3L, 5L), (1L, 4L, 0L),
      (2L, 3L, 10L), (2L, 4L, 5L), (3L, 4L, 5L)))
  }

  test("threshold gates: a pair beyond EditMaxDist is dropped") {
    val far = head + ("z" * 100) // same block, distance 100 from doc 1
    val got = pairs(Seq(
      (1L, head + "dog"),
      (2L, far)))
    assert(got.isEmpty, s"distance > ${Dedup.EditMaxDist} must not qualify")
  }

  test("length prune is exact: the gate loses no qualifying pair") {
    // length gap exactly EditMaxDist: the pure-append pair sits ON the
    // boundary (distance == length gap == threshold) and must survive
    val tail = "x" * Dedup.EditMaxDist.toInt
    val got = pairs(Seq((1L, head), (2L, head + tail)))
    assert(got == Seq((1L, 2L, Dedup.EditMaxDist)))
    // one past the boundary: pruned by length before any distance work,
    // and correctly so (levenshtein >= length gap > threshold)
    val got2 = pairs(Seq((1L, head), (2L, head + tail + "x")))
    assert(got2.isEmpty)
  }

  test("blocking: pairs in different prefix blocks never meet") {
    // distance 1 but the first char differs -> different 32-char blocks;
    // the blocking rule (mirrored in the oracle) excludes the pair
    val got = pairs(Seq((1L, "a" + head), (2L, "b" + head)))
    assert(got.isEmpty, "cross-block pairs are out of scope by the rule")
  }

  test("brute cross-check on a random revision corpus") {
    val rnd = new scala.util.Random(18)
    // 12 docs in 3 revision families: a family base body plus up to a
    // dozen random point edits per revision (true near-dup geometry)
    val bases = (0 until 3).map(_ => (0 until 80).map(_ =>
      ('a' + rnd.nextInt(4)).toChar).toArray)
    val docs = (0 until 12).map { i =>
      val fam = i % 3
      val body = bases(fam).clone()
      (0 until rnd.nextInt(13)).foreach { _ =>
        body(rnd.nextInt(body.length)) = ('a' + rnd.nextInt(4)).toChar
      }
      (i.toLong, s"family-$fam-" + head + new String(body))
    }
    val got = pairs(docs).toSet
    // brute twin: same blocking + threshold, distance by DP
    def lev(a: String, b: String): Long = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length).toLong
    }
    val brute = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      if ta.take(Dedup.EditPrefixChars) == tb.take(Dedup.EditPrefixChars)
      d = lev(ta, tb) if d <= Dedup.EditMaxDist
    } yield (ia, ib, d)).toSet
    assert(brute.nonEmpty, "fixture must produce qualifying pairs")
    assert(got == brute, s"blocked path diverged from brute:\n$got\nvs\n$brute")
  }
}
