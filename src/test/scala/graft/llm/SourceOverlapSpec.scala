package graft.llm

import graft.SparkSpec

/** Pins [[Dedup.sourceOverlapOf]]: hand-computed shared-shingle counts
  * and Jaccard on a fixture with known 3-gram sets, ordered-pair output
  * (a < b, no mirror rows), disjoint sources produce NO row, and
  * sub-3-token docs contribute nothing. */
class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  // srcA: {"a b c", "b c d"} (doc1) ∪ {"a b c"} (doc2) = {abc, bcd}
  // srcB: {"a b c"} — shares abc with A
  // srcC: {"x y z"} — disjoint from both
  // srcD: "p q" too short → no shingles at all
  private val fixture = Seq(
    ("srcA", "a b c d"),
    ("srcA", "a b c"),
    ("srcB", "a b c"),
    ("srcC", "x y z"),
    ("srcD", "p q"))

  private def run() =
    Dedup.sourceOverlapOf(fixture.toDF("source", "text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .toSeq

  test("hand-computed overlap counts and Jaccard; disjoint pairs absent") {
    val out = run()
    // only (srcA, srcB) shares anything: |A|=2, |B|=1, shared=1,
    // J = 1/(2+1-1) = 0.5
    assert(out === Seq(("srcA", "srcB", 2L, 1L, 1L, 0.5)))
  }

  test("ordered pairs only — no mirror or self rows") {
    val out = run()
    assert(out.forall { case (a, b, _, _, _, _) => a < b })
  }
}
