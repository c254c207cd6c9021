package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.llm.Corpus

/** Pins [[SnapshotDiffStream]]: the per-doc digest state accumulates
  * across micro-batches (a doc's prev/cur evidence arriving in different
  * batches still folds into one status), every status category falls out
  * of the mod-rule fan-out on hand-picked ids, and the drained state
  * equals the batch aggregation of the same definition (stream-batch
  * equivalence at spec scale; the registered entry certifies it at sf
  * scale by sharing the batch oracle verbatim). */
class SnapshotDiffStreamSpec extends SparkSpec {
  import spark.implicits._

  // ids chosen against the Diff* mod rules: 1 → unchanged; 3 (%7=3, no
  // prev) → added; 5 (%11=5, no cur) → removed; 20 (%5=0, mutated prev)
  // → changed
  private val fixture = Seq(1L -> "alpha", 3L -> "beta",
    5L -> "gamma", 20L -> "delta")

  test("cross-batch digest state classifies every category") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val digests = SnapshotDiffStream.digestsOf(
      SnapshotDiffStream.versionsOf(docs))
    val q = digests.writeStream
      .format("memory").queryName("sds")
      .outputMode(OutputMode.Complete())
      .start()
    mem.addData(fixture(0), fixture(2))
    q.processAllAvailable()
    mem.addData(fixture(1), fixture(3))
    q.processAllAvailable()
    val streamed = Corpus.classifyDiff(spark.table("sds"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    q.stop()
    assert(streamed.sameElements(Array(1L -> "unchanged", 3L -> "added",
      5L -> "removed", 20L -> "changed")))

    // stream-batch equivalence of the same definition in one batch pass
    val batch = Corpus.classifyDiff(SnapshotDiffStream.digestsOf(
      SnapshotDiffStream.versionsOf(fixture.toDF("doc_id", "text"))))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(streamed.sameElements(batch))
  }
}
