package graft.llm

import graft.SparkSpec

/** Pins [[TextAnalysis.bpeApplyOf]]'s merge-application semantics with
  * hand-computed token streams: greedy left-to-right within a rule,
  * rank-ordered across rules (an earlier merge consuming a token starves
  * later rules of that pair), joiner-based collision immunity, and the
  * short-merge-table path (ranks with no rule row are no-ops). */
class BpeApplySpec extends SparkSpec {
  import spark.implicits._

  private def merges(rules: (String, String)*) =
    rules.zipWithIndex
      .map { case ((l, r), i) => (l, r, i + 1) }
      .toDF("left", "right", "rnk")

  private def apply1(text: String, rules: (String, String)*): (Long, Long, Long) = {
    val r = TextAnalysis.bpeApplyOf(
      Seq((1L, text)).toDF("doc_id", "text"), merges(rules: _*))
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3)) // (before, after, merges)
  }

  test("greedy left-to-right: 'a a a' + (a,a) merges the FIRST pair only") {
    // "a a a" → "a_a a", never "a a_a": 3 tokens before, 2 after.
    assert(apply1("a a a", ("a", "a")) === ((3L, 2L, 1L)))
    // Four a's pair up twice: "a_a a_a".
    assert(apply1("a a a a", ("a", "a")) === ((4L, 2L, 2L)))
  }

  test("rank order: an earlier merge starves a later rule's pair") {
    // (x,y) at rank 1 consumes y, so rank-2 (y,z) never fires: "x_y z".
    assert(apply1("x y z", ("x", "y"), ("y", "z")) === ((3L, 2L, 1L)))
    // Reversed ranks: (y,z) fires first, then (x,y) finds no bare y.
    assert(apply1("x y z", ("y", "z"), ("x", "y")) === ((3L, 2L, 1L)))
  }

  test("joiner immunity: a merged symbol never re-matches its bare suffix") {
    // After (a,b) → "a_b", rule (b,c) must NOT see the trailing b of a_b.
    assert(apply1("a b c", ("a", "b"), ("b", "c")) === ((3L, 2L, 1L)))
    // But a LATER rule naming the merged symbol itself does fire.
    assert(apply1("a b c", ("a", "b"), ("a_b", "c")) === ((3L, 1L, 2L)))
  }

  test("merge table shorter than BpeTopPairs: missing ranks are no-ops") {
    assert(apply1("p q p q", ("p", "q")) === ((4L, 2L, 2L)))
    // Empty table: stream unchanged, zero merges.
    val r = TextAnalysis.bpeApplyOf(
      Seq((1L, "p q")).toDF("doc_id", "text"),
      Seq.empty[(String, String, Int)].toDF("left", "right", "rnk"))
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 2L, 0L)))
  }

  test("digest: retok_md5 hashes the space-joined re-tokenized stream") {
    val row = TextAnalysis.bpeApplyOf(
      Seq((1L, "a a b")).toDF("doc_id", "text"), merges(("a", "a")))
      .collect().head
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("a_a b".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getString(4) === expect)
  }
}
