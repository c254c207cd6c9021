package graft.llm

import graft.SparkSpec

/** Pins [[TextAnalysis.bpeTrainedMergesOf]]'s iterative semantics beyond
  * what the cross-engine oracle certifies: the recount after each merge
  * (which the one-shot [[TextAnalysis.bpePairsOf]] ranking cannot see),
  * composite merges of earlier rounds' joined symbols, and the
  * trained-table → [[TextAnalysis.bpeApplyOf]] round trip. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def train(texts: String*): Seq[(Long, String, String, Long)] =
    TextAnalysis.bpeTrainedMergesOf(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  test("recount diverges from the one-shot ranking") {
    // One-shot counts on "x y x y x y": (x,y)=3, (y,x)=2 — a one-shot
    // table would rank (y,x) second. Training applies (x,y) first, after
    // which the stream is "x_y x_y x_y" and (y,x) no longer EXISTS; the
    // recount instead finds (x_y, x_y)=2.
    val rules = train("x y x y x y")
    assert(rules.head === ((1L, "x", "y", 3L)))
    assert(rules(1) === ((2L, "x_y", "x_y", 2L)))
  }

  test("composite symbols keep merging across rounds") {
    // Round 1: (a,a) over 8 a's → 7 adjacent pairs counted, greedy apply
    // leaves "a_a a_a a_a a_a". Round 2: (a_a,a_a)=3 → "a_a_a_a a_a_a_a".
    // Round 3: (a_a_a_a,a_a_a_a)=1 → one 8-token symbol; further rounds
    // find no pairs and emit no rules.
    val rules = train("a a a a a a a a")
    assert(rules.map(r => (r._1, r._2, r._3)) === Seq(
      (1L, "a", "a"), (2L, "a_a", "a_a"), (3L, "a_a_a_a", "a_a_a_a")))
    assert(rules.map(_._4) === Seq(7L, 3L, 1L))
  }

  test("trained table through bpeApplyOf reproduces the loop's final stream") {
    val docs = Seq((1L, "x y x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val trained = TextAnalysis.bpeTrainedMergesOf(docs)
    val out = TextAnalysis.bpeApplyOf(docs, trained,
        maxRank = TextAnalysis.BpeTrainRounds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: "x y x y x y"(6) → "x_y x_y x_y"(3) → "x_y_x_y x_y"(2) → ...
    // every merge the loop learned must re-apply identically from scratch
    assert(out(1L)._1 === 6L)
    assert(out(1L)._2 < 6L)
    // doc 2 shares the (x,y) merge, and a later round merges (x_y, z)
    // — "x_y" sorts before "x_y_x_y" on the count-1 tie — so the doc
    // collapses to the single symbol "x_y_z"
    assert(out(2L) === ((3L, 1L)))
  }

  test("rule count is bounded by rounds and ranks are dense from 1") {
    val rules = train("p q", "p q", "q p")
    assert(rules.size <= TextAnalysis.BpeTrainRounds)
    assert(rules.map(_._1) === (1L to rules.size).toSeq)
  }
}
