package graft.llm

import graft.SparkSpec

/** Pins the Gopher rules battery ([[TextAnalysis.gopherRulesOf]], r13):
  * each rule's boundary on planted docs, the ellipsis arithmetic of the
  * symbol ratio, and the composite verdict. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private val stops = "the be to of and that have with" // 8 distinct stops

  private val docs: Seq[(Long, String)] = Seq(
    1L -> (stops + (" word" * 42)),        // 50 words, clean → passes
    2L -> (stops + " word"),               // 9 words → word-count fail
    3L -> (stops + (" ####" * 42)),        // symbol + alpha fail
    4L -> (stops + (" 1234" * 42)),        // alpha fail only
    5L -> ("word" + (" word" * 49)),       // 50 words, no stops
    6L -> (("ab" + (" ab" * 47)) + " " + "the be"), // mean len 2.04 → fail
    7L -> "aaa ... bbb")                   // ellipsis arithmetic

  private lazy val rows = TextAnalysis.gopherRulesOf(docs.toDF("doc_id", "text"))
    .collect()
    .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7),
      r.getBoolean(8), r.getBoolean(9), r.getBoolean(10), r.getBoolean(11)))
    .toMap

  private def flags(id: Long) = {
    val r = rows(id); (r._6, r._7, r._8, r._9, r._10, r._11)
  }

  test("a clean 50-word doc with all stop words passes every rule") {
    assert(rows(1L)._1 == 50L && rows(1L)._5 == 8L)
    assert(flags(1L) == ((true, true, true, true, true, true)))
  }

  test("9 words fails only the word-count rule") {
    assert(flags(2L) == ((false, true, true, true, true, false)))
  }

  test("#### filler fails the symbol AND alpha rules") {
    val (fw, fm, fs, fa, fst, p) = flags(3L)
    assert(fw && !fs && !fa && fst && !p)
  }

  test("numeric filler fails only the alpha rule") {
    assert(flags(4L) == ((true, true, true, false, true, false)))
  }

  test("no stop words fails only the stop-word rule") {
    assert(rows(5L)._5 == 0L)
    assert(flags(5L) == ((true, true, true, true, false, false)))
  }

  test("two-char words fail the mean-length rule") {
    assert(rows(6L)._2 < 3.0)
    assert(flags(6L)._2 == false)
  }

  test("ellipsis counts as one symbol per three dots") {
    // "aaa ... bbb": 3 words, one '...' → (0 + 3/3) / 3 = 0.333333
    assert(rows(7L)._3 == 0.333333)
  }
}
