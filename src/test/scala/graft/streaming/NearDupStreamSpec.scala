package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.llm.Dedup

/** Pins [[NearDupStream]]: the streamed bucket census accumulates across
  * micro-batches (two near-identical docs arriving in DIFFERENT batches
  * still collide), sub-3-token docs are excluded like the batch/oracle
  * construction, and the census equals the batch aggregation over the
  * same banding relation (stream-batch equivalence at spec scale). */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi"

  test("cross-batch near-dups collide in the streamed census") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val census = NearDupStream.censusOf(
      Dedup.bandsFromSets(NearDupStream.streamSets(docs)))
    val q = census.writeStream
      .format("memory").queryName("ndc")
      .outputMode(OutputMode.Complete())
      .start()
    // batch 1: one doc + an unrelated doc + a too-short doc (excluded)
    mem.addData(1L -> base, 10L -> base.split(" ").reverse.mkString(" "),
      99L -> "a b")
    q.processAllAvailable()
    // batch 2: a near-identical doc (one word changed at the end) — the
    // collision spans micro-batches, so it certifies census STATE
    mem.addData(2L -> (base.dropRight(2) + "rho"))
    q.processAllAvailable()
    val streamed = spark.table("ndc")
      .where(col("n_docs") >= 2)
      .select(col("band"), col("bkey"), col("n_docs"), col("min_doc"), col("max_doc"))
      .collect().map(_.toSeq).toSet
    q.stop()

    // docs 1 and 2 share 13 of ~16 shingles -> some of the 16 bands must
    // collide; doc 99 (< 3 tokens) contributes nothing
    assert(streamed.nonEmpty)
    assert(streamed.forall(r => r(3) == 1L && r(4) == 2L && r(2) == 2L))

    // stream-batch equivalence: the same census computed in one batch pass
    val batch = NearDupStream.censusOf(
      Dedup.bandsFromSets(NearDupStream.streamSets(Seq(
        1L -> base, 10L -> base.split(" ").reverse.mkString(" "),
        99L -> "a b", 2L -> (base.dropRight(2) + "rho")).toDF("doc_id", "text"))))
      .where(col("n_docs") >= 2)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }
}
