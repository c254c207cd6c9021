package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Pins [[DataCardStream]]: the per-source card accumulates across
  * micro-batches (volumes add up, the language set unions), and the
  * drained state equals the batch aggregation over the union of all
  * batches (stream-batch equivalence at spec scale). */
class DataCardStreamSpec extends SparkSpec {
  import spark.implicits._

  private val b1 = Seq(
    ("a", "en", 8L, "one two"),
    ("a", "de", 11L, "eins zwei drei"),
    ("b", "fr", 6L, "un deux"))
  private val b2 = Seq(
    ("a", "en", 13L, "three four five"),
    ("b", "fr", 9L, "trois"),
    ("b", "it", 4L, "uno due tre quattro"))

  test("cross-batch accumulation equals the batch card") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, String)]
    val docs = mem.toDF().toDF("source", "lang", "n_chars", "text")
    val q = DataCardStream.cardOf(docs).writeStream
      .format("memory").queryName("dcs")
      .outputMode(OutputMode.Complete())
      .start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    val streamed = spark.table("dcs").collect().map(_.toSeq).toSet
    q.stop()

    val batch = DataCardStream.cardOf(
      (b1 ++ b2).toDF("source", "lang", "n_chars", "text"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)

    // hand check: source a = 3 docs, 32 chars, 2+3+3=8 tokens, 2 langs
    val a = streamed.find(_.head == "a").get
    assert(a(1) == 3L && a(2) == 32L && a(3) == 8L && a(5) == 2L)
  }
}
