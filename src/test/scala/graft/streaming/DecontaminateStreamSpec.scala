package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.llm.Corpus

/** Pins [[DecontaminateStream]]: arriving docs screened against the
  * offline-built benchmark gram set + Bloom prefilter produce EXACTLY
  * the batch decontamination verdicts, with docs arriving across
  * micro-batches; benchmark docs themselves are out of scope; the bloom
  * guard never loses a hit (no false negatives by construction). The
  * registered entry certifies the same equivalence at sf scale by
  * sharing the batch oracle verbatim. */
class DecontaminateStreamSpec extends SparkSpec {
  import spark.implicits._

  // BenchmarkMod = 41 → doc 0 and 41 are benchmark docs; doc 1 shares a
  // full 3-gram run with doc 0 (contaminated), doc 2 is clean, doc 3 is
  // too short for shingles (out of scope)
  private val docs = Seq(
    (0L, "alpha beta gamma delta epsilon"),
    (41L, "zeta eta theta iota"),
    (1L, "x alpha beta gamma y"),
    (2L, "one two three four"),
    (3L, "tiny doc"))

  private def benchGrams() = docs.toDF("doc_id", "text")
    .where(col("doc_id") % Corpus.BenchmarkMod === 0)
    .select(explode(graft.llm.Text.shingles(col("text"),
      graft.llm.Dedup.ShingleK)).as("sh"))
    .distinct()

  private def bloomOf(grams: org.apache.spark.sql.DataFrame): Array[Byte] =
    grams.agg(org.apache.spark.sql.graft.functions.bloom_build(
        graft.llm.Text.hash64(col("sh")),
        Corpus.BloomExpectedItems, Corpus.BloomFpp).as("f"))
      .head().getAs[Array[Byte]](0)

  test("cross-batch screening equals the batch verdicts; bench docs out of scope") {
    implicit val sqlCtx = spark.sqlContext
    val grams = benchGrams()
    val bloom = bloomOf(grams)
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = DecontaminateStream.aggedOf(stream, grams, bloom).writeStream
      .format("memory").queryName("dcs")
      .outputMode(OutputMode.Complete())
      .start()
    mem.addData(docs(0), docs(2)) // bench doc + contaminated doc, batch 1
    q.processAllAvailable()
    mem.addData(docs(1), docs(3), docs(4)) // rest in batch 2
    q.processAllAvailable()
    val out = spark.table("dcs").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    q.stop()

    // docs 0/41 (benchmark) and 3 (no shingles) are out of scope
    assert(out.keySet == Set(1L, 2L))
    // doc 1: 3 distinct shingles, one ("alpha beta gamma") in the set
    assert(out(1L) == ((3L, 1L)))
    // doc 2: 2 distinct shingles, clean
    assert(out(2L) == ((2L, 0L)))
  }

  test("the bloom prefilter is LIVE: a decoy filter suppresses a real hit") {
    // screen the CONTAMINATED doc against a filter built over a decoy
    // gram set: its true hit ("alpha beta gamma" ∈ benchGrams) is
    // rejected by the probe before the confirm join, so hits drop 1 → 0
    // — proving the probe actually gates the join (the green entry
    // therefore certifies the real filter, not dead code) and exactly
    // why correctness rides on the filter's no-false-negatives side
    implicit val sqlCtx = spark.sqlContext
    val grams = benchGrams()
    val decoy = bloomOf(Seq("nothing here really")
      .toDF("sh").select(col("sh")))
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = DecontaminateStream.aggedOf(stream, grams, decoy).writeStream
      .format("memory").queryName("dcs2")
      .outputMode(OutputMode.Complete())
      .start()
    mem.addData(docs(2)) // doc 1, the contaminated one
    q.processAllAvailable()
    val out = spark.table("dcs2").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    q.stop()
    assert(out(1L) == ((3L, 0L)), "decoy filter must suppress the hit")
  }
}
