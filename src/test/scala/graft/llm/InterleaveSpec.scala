package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the SOURCE-INTERLEAVED training order (r18, Corpus.interleave):
  * round-robin across sources, deterministic, with the ordered output
  * itself as the contract. */
class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  test("round-robin: position k serves each source's k-th doc in turn") {
    val order = Corpus.interleave(spark, sf001)
      .as[(Long, String, Long)].collect().toSeq
    val bySource = order.groupBy(_._2)
    // per-source positions are exactly 1..n_s in doc_id order
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_._3) == (1L to rows.size.toLong),
        s"$src positions must be dense ranks")
      assert(rows.map(_._1) == rows.map(_._1).sorted,
        s"$src must serve docs in doc_id order")
    }
    // the global order is (epoch_pos, source, doc_id): every prefix of
    // the epoch is balanced — per-source counts differ by at most 1
    // while every source still has docs left
    val nSources = bySource.size
    val minSize = bySource.values.map(_.size).min
    (1 to minSize).foreach { k =>
      val prefix = order.take(k * nSources)
      val counts = prefix.groupBy(_._2).values.map(_.size).toSet
      assert(counts == Set(k),
        s"after $k full rounds every source must have served exactly $k docs")
    }
  }

  test("deterministic: two runs produce the identical order") {
    val a = Corpus.interleave(spark, sf001).collect().toSeq
    val b = Corpus.interleave(spark, sf001).collect().toSeq
    assert(a == b)
  }
}
