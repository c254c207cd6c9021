package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Corpus.leakageSafeSplitOf]] (the leakage invariant: a near-dup
  * cluster never straddles splits) and [[Corpus.shuffleShardsOf]] (the
  * deterministic global shuffle: every doc dealt exactly once, shards
  * roughly balanced, order reproducible). */
class SplitShardsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(ids: Seq[Long]) =
    ids.map(i => (i, s"tok$i words $i")).toDF("doc_id", "text")

  test("split: every cluster member lands in the canonical's split") {
    val d = docsDf(1L to 30L)
    val cl = Seq( // two clusters: {1,2,3} canon 1, {10,11} canon 10
      (1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val out = Corpus.leakageSafeSplitOf(d, cl).collect()
    assert(out.length === 30)
    val byDoc = out.map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // cluster members: same canon, same split — the leakage invariant
    assert(Seq(1L, 2L, 3L).map(byDoc(_)).distinct.size === 1)
    assert(Seq(10L, 11L).map(byDoc(_)).distinct.size === 1)
    // unclustered docs are their own canonical
    assert(byDoc(20L)._1 === 20L)
    // the split is the hash gate of the CANON id: doc 2 splits like doc 1,
    // not like an unclustered doc 2 would
    val solo = Corpus.leakageSafeSplitOf(docsDf(Seq(2L)),
      Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")).collect()
    assert(byDoc(2L)._2 === byDoc(1L)._2)
    assert(solo.head.getLong(1) === 2L) // own canon when unclustered
  }

  test("split: deterministic and total over train/val/test") {
    val d = docsDf(1L to 200L)
    val cl = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    val a = Corpus.leakageSafeSplitOf(d, cl).collect()
    val b = Corpus.leakageSafeSplitOf(d.repartition(7), cl).collect()
    assert(a.toSeq === b.toSeq)
    val bySplit = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // 900/50/50 per-mille: train dominates on any non-adversarial corpus
    assert(bySplit("train") > bySplit.getOrElse("val", 0))
    assert(bySplit("train") > bySplit.getOrElse("test", 0))
  }

  test("shards: exact deal — every doc once, shard = skey mod ShardCount") {
    val out = Corpus.shuffleShardsOf(docsDf(1L to 100L)).collect()
    assert(out.length === 100)
    assert(out.map(_.getLong(2)).sorted.toSeq === (1L to 100L))
    out.foreach { r =>
      assert(r.getLong(0) === math.floorMod(r.getLong(1), Corpus.ShardCount))
    }
    // dump order IS the contract: (shard, skey, doc_id) ascending
    val key = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(key === key.sorted)
    // the salted hash spreads: no shard is empty or dominant at n=100
    val sizes = out.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(sizes.size === Corpus.ShardCount)
    assert(sizes.values.max <= 3 * sizes.values.min)
  }

  test("shards: partitioning-independent (deterministic permutation)") {
    val d = docsDf(1L to 64L)
    val a = Corpus.shuffleShardsOf(d).collect().toSeq
    val b = Corpus.shuffleShardsOf(d.repartition(13)).collect().toSeq
    assert(a === b)
  }

  test("shards: n_tokens counts whitespace tokens") {
    val d = Seq((1L, "a b c"), (2L, "one")).toDF("doc_id", "text")
    val out = Corpus.shuffleShardsOf(d).collect()
      .map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(out === Map(1L -> 3L, 2L -> 1L))
  }
}
