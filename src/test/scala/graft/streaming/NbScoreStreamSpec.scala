package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.llm.TextAnalysis

/** Pins [[NbScoreStream]]: a doc's token occurrences arriving in ONE
  * batch score identically to the batch classifier over the same corpus
  * (stream-batch equivalence of the shared model + exact-decimal fold),
  * and the keyed state accumulates across micro-batches. The registered
  * entry certifies the same equivalence at sf scale by sharing the batch
  * oracle verbatim. */
class NbScoreStreamSpec extends SparkSpec {
  import spark.implicits._

  // src0/src1 ∈ NbTargetSources; srcX/srcY are raw
  private val corpus = Seq(
    (1L, "src0", "wiki wiki clean prose"),
    (2L, "src1", "clean prose citation"),
    (3L, "srcX", "spam spam buy now"),
    (4L, "srcY", "buy spam and wiki"))

  private def model() = {
    val labels = corpus.map { case (id, src, _) => (id, src) }
      .toDF("doc_id", "source")
      .select(col("doc_id"), TextAnalysis.nbLabel(col("source")).as("is_target"))
    val tf = corpus.map { case (id, _, text) => (id, text) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    TextAnalysis.nbModelFrom(tf.join(labels, "doc_id"), labels)
  }

  test("streamed occurrence fold equals the batch classifier across batches") {
    implicit val sqlCtx = spark.sqlContext
    val (w, pri) = model()
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "source", "text")
    val q = NbScoreStream.aggedOf(docs, w).writeStream
      .format("memory").queryName("nbs")
      .outputMode(OutputMode.Complete())
      .start()
    mem.addData(corpus(0), corpus(2))
    q.processAllAvailable()
    mem.addData(corpus(1), corpus(3))
    q.processAllAvailable()
    val streamed = TextAnalysis.nbFinish(spark.table("nbs"), pri)
      .collect().map(_.toSeq)
    q.stop()

    val labels = corpus.map { case (id, src, _) => (id, src) }
      .toDF("doc_id", "source")
    val tf = corpus.map { case (id, _, text) => (id, text) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val batch = TextAnalysis.nbQualityClassifierOf(labels, tf)
      .collect().map(_.toSeq)
    assert(streamed.length === 4)
    assert(streamed.toSeq === batch.toSeq)
  }
}
