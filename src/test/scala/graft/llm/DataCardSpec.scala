package graft.llm

import graft.SparkSpec

/** Pins the per-source data card ([[Corpus.dataCardOf]], r13):
  * cross-source duplicate charging (a hash shared by two sources marks a
  * dup doc in BOTH cards), the top-language tiebreak (count desc, then
  * lexicographic), and the volume/mean arithmetic. */
class DataCardSpec extends SparkSpec {
  import spark.implicits._

  // source a: 3 docs, langs en/en/de (en top by count); "dup here" is
  //   duplicated WITHIN a and ALSO appears in b
  // source b: 2 docs, langs fr/de with equal counts (de wins the tie);
  //   one doc duplicates a's text cross-source
  private val d = Seq(
    (1L, "a", "en", 8L, "dup here"),
    (2L, "a", "en", 8L, "dup here"),
    (3L, "a", "de", 11L, "unique in a"),
    (4L, "b", "fr", 8L, "dup here"),
    (5L, "b", "de", 13L, "only b text x")
  ).toDF("doc_id", "source", "lang", "n_chars", "text")

  test("cards match hand computation; cross-source dups charged to both") {
    val got = Corpus.dataCardOf(d).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getString(6), r.getLong(7),
        r.getDouble(8))).toMap
    // source a: 3 docs, chars 8+8+11=27, tokens 2+2+3=7, mean 7/3,
    //   2 langs, top en, dups: docs 1,2 (hash count 3 corpus-wide) → 2
    assert(got("a") == ((3L, 27L, 7L,
      BigDecimal(7.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble,
      2L, "en", 2L,
      BigDecimal(2.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)))
    // source b: 2 docs, chars 21, tokens 2+4=6, mean 3.0, 2 langs,
    //   top de (fr/de tie 1-1 → lexicographic), dup: doc 4 → 1, frac 0.5
    assert(got("b") == ((2L, 21L, 6L, 3.0, 2L, "de", 1L, 0.5)))
  }
}
