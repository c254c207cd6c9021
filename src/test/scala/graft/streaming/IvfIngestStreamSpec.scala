package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.llm.Similarity

/** Pins [[IvfIngestStream]]: the stream-legal per-row argmax assignment
  * equals the batch window's rn = 1 assignment on real corpus data, and
  * the streamed inverted-list census accumulates across micro-batches
  * (vectors arriving in different batches land in the same list state). */
class IvfIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def cents(dir: String) =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") >= Similarity.CentroidBase &&
        col("vec_id") < Similarity.CentroidBase + Similarity.Centroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))

  test("stream assignment equals the batch window's rn=1 on sf0.001") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val streamed = IvfIngestStream.assignStream(e, cents(sf001))
      .orderBy(col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val batch = Similarity.ivfIndex(spark, sf001).where(col("rn") === 1)
      .select(col("vec_id"), col("cent_id"))
      .orderBy(col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.length == batch.length && streamed.sameElements(batch))
  }

  test("census state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val census = IvfIngestStream.censusOf(
      IvfIngestStream.assignStream(stream, cents(sf001)))
    val q = census.writeStream
      .format("memory").queryName("ivfc")
      .outputMode(OutputMode.Complete())
      .start()
    val (first, second) = e.splitAt(e.length / 2)
    mem.addData(first.toSeq)
    q.processAllAvailable()
    mem.addData(second.toSeq)
    q.processAllAvailable()
    val streamed = spark.table("ivfc")
      .select(col("cent_id"), col("n_vecs"), col("min_vec"), col("max_vec"))
      .collect().map(_.toSeq).toSet
    q.stop()
    val batch = IvfIngestStream.census(spark, sf001)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch, "cross-batch census diverged from batch")
    // every centroid id is itself a vector, so every list is occupied
    assert(streamed.size == Similarity.Centroids)
  }
}
