package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.llm.TextAnalysis

/** Pins [[QuantileSketchStream]]: per-shard state stays bounded at k
  * pairs however much stream flows through, the cross-batch fold is
  * order-free (bottom-k associativity), and the drained states finished
  * by union + re-take equal the BATCH tournament's output exactly —
  * stream-batch equivalence for the sketch family at spec scale. */
class QuantileSketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("cross-batch fold equals the batch sketch; state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = (1L to 2000L).map(i => (i, (i * 7) % 613L))
    val b2 = (2001L to 3500L).map(i => (i, (i * 11) % 997L))
    val b3 = (3501L to 5000L).map(i => (i, i % 251L))
    val mem = MemoryStream[(Long, Long)]
    val docs = mem.toDF().toDF("doc_id", "n_chars")
    val q = QuantileSketchStream.shardStates(docs).toDF().writeStream
      .format("memory").queryName("qss")
      .outputMode(OutputMode.Update())
      .start()
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*); q.processAllAvailable()
    }
    // memory sink in update mode APPENDS each trigger's emissions — the
    // final state per shard is its LAST row (what the entry's dynamic-
    // partition overwrite keeps)
    val states = spark.table("qss")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("n").desc)))
      .where(col("rn") === 1).drop("rn")
    val statesLocal = states.collect()
    q.stop()

    // bounded state: no shard holds more than k pairs; counts sum to n
    assert(statesLocal.forall(_.getSeq[Long](1).size <= TextAnalysis.QskK),
      "a shard buffer exceeded k")
    assert(statesLocal.map(_.getLong(3)).sum == 5000L,
      "shard counts must sum to the stream total")

    val streamed = QuantileSketchStream.finishFrom(
        states, (b1 ++ b2 ++ b3).toDF("doc_id", "n_chars"))
      .collect().map(_.toSeq).toList
    val batch = TextAnalysis.quantileSketchOf(
        (b1 ++ b2 ++ b3).toDF("doc_id", "n_chars"))
      .collect().map(_.toSeq).toList
    assert(streamed == batch,
      s"drained sketch must equal the batch tournament:\n$streamed\nvs\n$batch")
  }

  test("single-batch stream equals batch too (no cross-batch artifacts)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 300L).map(i => (i, (i * i) % 101L))
    val mem = MemoryStream[(Long, Long)]
    val docs = mem.toDF().toDF("doc_id", "n_chars")
    val q = QuantileSketchStream.shardStates(docs).toDF().writeStream
      .format("memory").queryName("qss1")
      .outputMode(OutputMode.Update())
      .start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val states = spark.table("qss1")
    val got = QuantileSketchStream.finishFrom(
        states, rows.toDF("doc_id", "n_chars"))
      .collect().map(_.toSeq).toList
    q.stop()
    val want = TextAnalysis.quantileSketchOf(rows.toDF("doc_id", "n_chars"))
      .collect().map(_.toSeq).toList
    assert(got == want)
  }
}
