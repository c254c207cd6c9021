package graft.llm

import graft.SparkSpec

/** Pins [[TextAnalysis.repetitionOf]]'s sorted-fold max-run logic against
  * hand-computed gram frequencies, and [[Corpus.decontaminate]]'s
  * invariants on real test data. */
class TextRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def rep(text: String): Option[(Long, Long, Double)] =
    TextAnalysis.repetitionOf(Seq(("d", text)).toDF("doc_id", "text"))
      .collect().headOption
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("repeating trigram pattern: 'a b c' x3 windows over 8 tokens") {
    // grams: [a b c, b c a, c a b, a b c, b c a, c a b] -> max freq 2 of 6
    assert(rep("a b c a b c a b") === Some((6L, 2L, 0.333333)))
  }

  test("all-distinct grams => max freq 1") {
    assert(rep("one two three four five") === Some((3L, 1L, 0.333333)))
  }

  test("fully repetitive doc => ratio 1.0") {
    assert(rep("w w w w") === Some((2L, 2L, 1.0)))
  }

  test("exactly 3 tokens => single gram, ratio 1.0; shorter is out of scope") {
    assert(rep("x y z") === Some((1L, 1L, 1.0)))
    assert(rep("x y") === None)
  }

  test("decontaminate invariants on sf0.001: no benchmark docs, bounded counts") {
    val out = Corpus.decontaminate(spark, sf001)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) % Corpus.BenchmarkMod != 0))
    assert(out.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)))
    assert(out.forall(r => r.getBoolean(3) === (r.getLong(2) > 0)))
  }
}
