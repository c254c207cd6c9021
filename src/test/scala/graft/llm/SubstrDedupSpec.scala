package graft.llm

import java.security.MessageDigest

import graft.SparkSpec

/** Pins [[Corpus.substrDedupOf]] (ExactSubstr) at a small window width:
  * duplicate marking is corpus-wide (within-doc repeats count), span merge
  * geometry (overlapping windows collapse; exactly-adjacent spans merge;
  * gap-separated spans stay apart), boundary spans (repeat at doc start /
  * end, fully-duplicated doc → md5("")), and the doc-shorter-than-W and
  * untouched-doc passthrough rows. Width 4 here; the production width is
  * [[Corpus.SubstrWidth]] — the operator is width-generic. */
class SubstrDedupSpec extends SparkSpec {
  import spark.implicits._

  private val W = 4

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** doc_id -> (n_dup_pos, n_spans, dup_chars, clean_md5) */
  private def run(docs: (Long, String)*): Map[Long, (Long, Long, Long, String)] =
    Corpus.substrDedupOf(docs.toDF("doc_id", "text"), W)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  test("shared span is cut from both docs; unique docs pass through") {
    // "ABCDEF" appears in docs 1 and 2 → windows at 3 positions each
    val out = run(
      1L -> "xyABCDEFqr",
      2L -> "stABCDEFuv",
      3L -> "nothinghere")
    // windows ABCD/BCDE/CDEF duplicated → one merged span [3,8] per doc
    assert(out(1L) === ((3L, 1L, 6L, md5hex("xyqr"))))
    assert(out(2L) === ((3L, 1L, 6L, md5hex("stuv"))))
    assert(out(3L) === ((0L, 0L, 0L, md5hex("nothinghere"))))
  }

  test("within-doc repeat counts toward the corpus-wide duplicate mark") {
    // "QRST" twice inside one doc → both occurrences are spans
    val out = run(1L -> "QRSTabcdefQRST")
    // dup positions 1 and 11; gap 10 > W → two spans [1,4] and [11,14]
    assert(out(1L) === ((2L, 2L, 8L, md5hex("abcdef"))))
  }

  test("exactly-adjacent spans merge (q = p + W); a 1-char gap does not") {
    // docs 2/3 plant the duplicate windows; doc 1 carries both copies
    // adjacently: positions 1 and 5 → q = p + W → ONE merged span [1,8]
    val adj = run(1L -> "ABCDEFGH", 2L -> "ABCD", 3L -> "EFGH")
    assert(adj(1L) === ((2L, 1L, 8L, md5hex(""))))
    // with an unduplicated separator between the copies (repeat-free:
    // "zzzzz" would plant its own within-doc "zzzz" dup) they stay apart
    val apart = run(1L -> "ABCDvwxyzEFGH", 2L -> "ABCD", 3L -> "EFGH")
    assert(apart(1L) === ((2L, 2L, 8L, md5hex("vwxyz"))))
  }

  test("repeat at the doc boundary leaves no empty tail segment") {
    // span ends exactly at len: tail gap [e+1, len] is empty and filtered
    val out = run(1L -> "headABCD", 2L -> "ABCDmore")
    assert(out(1L) === ((1L, 1L, 4L, md5hex("head"))))
    assert(out(2L) === ((1L, 1L, 4L, md5hex("more"))))
  }

  test("fully-duplicated doc hashes the empty string") {
    val out = run(1L -> "ABCDEFGH", 2L -> "ABCDEFGH")
    assert(out(1L) === ((5L, 1L, 8L, md5hex(""))))
    assert(out(2L) === ((5L, 1L, 8L, md5hex(""))))
  }

  test("doc shorter than W emits no windows and passes through untouched") {
    val out = run(1L -> "abc", 2L -> "ABCDE", 3L -> "ABCDE")
    assert(out(1L) === ((0L, 0L, 0L, md5hex("abc"))))
    // the short doc's text can't collide even if it appears inside others
    assert(out(2L)._1 === 2L) // windows ABCD, BCDE both duplicated
  }

  test("overlapping dup windows collapse into one span with correct char count") {
    // 6-char shared region → 3 overlapping windows, one span of 6 chars
    val out = run(1L -> "aaQWERTYbb", 2L -> "ccQWERTYdd")
    assert(out(1L)._1 === 3L)
    assert(out(1L)._2 === 1L)
    assert(out(1L)._3 === 6L)
  }
}
