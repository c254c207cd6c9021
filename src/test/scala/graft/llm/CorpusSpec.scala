package graft.llm

import java.security.MessageDigest

import graft.SparkSpec

/** Pins [[Corpus]] edge cases: chunk tails shorter than `ChunkSize`,
  * single-token docs, stride/overlap geometry, and the quantizer's
  * zero-vector guard (round-4 ADVICE #1). */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def chunksOf(text: String): Seq[(Long, Long, Long, String)] =
    Corpus.chunksOf(Seq(("d1", text)).toDF("doc_id", "text"))
      .select("chunk_idx", "chunk_start", "chunk_tokens", "chunk_md5")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("single-token doc => one chunk of 1 token") {
    assert(chunksOf("hello") ===
      Seq((0L, 1L, 1L, md5hex("hello"))))
  }

  test("doc shorter than ChunkSize => one tail chunk with all tokens") {
    val toks = (1 to 7).map(i => s"t$i")
    assert(chunksOf(toks.mkString(" ")) ===
      Seq((0L, 1L, 7L, md5hex(toks.mkString(" ")))))
  }

  test("doc of exactly ChunkSize tokens => full chunk + overlap tail") {
    // starts at 1 and 1+stride=41 (41 <= 50); the tail holds tokens 41..50
    val toks = (1 to Corpus.ChunkSize).map(i => s"t$i")
    assert(chunksOf(toks.mkString(" ")) === Seq(
      (0L, 1L, Corpus.ChunkSize.toLong, md5hex(toks.mkString(" "))),
      (1L, (Corpus.ChunkStride + 1).toLong,
        (Corpus.ChunkSize - Corpus.ChunkStride).toLong,
        md5hex(toks.drop(Corpus.ChunkStride).mkString(" ")))))
  }

  test("stride geometry: 130 tokens => starts 1,41,81,121 with 10-token overlap windows") {
    val toks = (1 to 130).map(i => s"t$i")
    val out = chunksOf(toks.mkString(" "))
    assert(out.map(c => (c._2, c._3)) ===
      Seq((1L, 50L), (41L, 50L), (81L, 50L), (121L, 10L)))
    // content check on an interior chunk: tokens 81..130
    assert(out(2)._4 === md5hex(toks.slice(80, 130).mkString(" ")))
    // chunk_idx is dense from 0
    assert(out.map(_._1) === Seq(0L, 1L, 2L, 3L))
  }

  test("quantizer drops all-zero vectors (127/0 guard) and keeps others") {
    val e = Seq(
      (1L, Array(0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, -2.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = Corpus.quantizeOf(e)
      .select("vec_id", "max_abs", "sum_abs_q")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // vec 1 filtered; vec 2: scale = 127/2, q = [64, -127, 32]
    assert(out.toSeq === Seq((2L, 2.0, 64L + 127L + 32L)))
  }
}
