package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the D4 prototype-pruning arithmetic ([[Similarity.d4PruneOf]])
  * on planted clusters: exactly floor(n/4) most-prototypical members
  * drop per cluster (ranked sim desc, vec_id tiebreak), sub-4 clusters
  * lose nothing, and the graded entry's keep fraction lands where the
  * drop rate says it must. */
class D4Spec extends SparkSpec {
  import spark.implicits._

  // cluster 10: n=5 (drop 1: the highest sim), cluster 20: n=4 (drop 1),
  // cluster 30: n=3 (drop 0), cluster 40: n=1 (drop 0),
  // cluster 50: n=8 (drop 2) with a sim TIE broken by vec_id
  private val state = Seq(
    (1L, 10L, 0.99), (2L, 10L, 0.70), (3L, 10L, 0.60), (4L, 10L, 0.50),
    (5L, 10L, 0.40),
    (6L, 20L, 0.95), (7L, 20L, 0.30), (8L, 20L, 0.20), (9L, 20L, 0.10),
    (10L, 30L, 0.90), (11L, 30L, 0.80), (12L, 30L, 0.70),
    (13L, 40L, 1.00),
    (14L, 50L, 0.88), (15L, 50L, 0.88), (16L, 50L, 0.50), (17L, 50L, 0.40),
    (18L, 50L, 0.30), (19L, 50L, 0.20), (20L, 50L, 0.10), (21L, 50L, 0.05))

  private lazy val out = Similarity.d4PruneOf(
      state.toDF("vec_id", "cent_id", "proto_sim"))
    .collect().map(r => r.getLong(0) -> r).toMap

  test("exactly floor(n/4) most-prototypical members drop per cluster") {
    val dropped = out.values.filterNot(_.getAs[Boolean]("kept"))
      .map(_.getLong(0)).toSet
    // n=5 -> vec 1; n=4 -> vec 6; n=3/n=1 -> none; n=8 -> the tie pair
    // (14, 15) ranks 1-2 by (sim desc, vec_id asc)
    assert(dropped == Set(1L, 6L, 14L, 15L))
  }

  test("ranks and cluster sizes are exact") {
    assert(out(1L).getAs[Long]("proto_rank") == 1L)
    assert(out(5L).getAs[Long]("proto_rank") == 5L)
    assert(out(1L).getAs[Long]("cluster_n") == 5L)
    assert(out(13L).getAs[Long]("cluster_n") == 1L &&
      out(13L).getAs[Boolean]("kept"))
    // the tie: vec 14 outranks vec 15 at equal sim
    assert(out(14L).getAs[Long]("proto_rank") == 1L)
    assert(out(15L).getAs[Long]("proto_rank") == 2L)
  }

  test("the graded entry's drop volume matches the rate") {
    val e = Similarity.d4Prune(spark, sf001).collect()
    val byCluster = e.groupBy(_.getAs[Long]("cent_id"))
    byCluster.foreach { case (c, rows) =>
      val n = rows.length
      val droppedN = rows.count(!_.getAs[Boolean]("kept"))
      assert(droppedN == n / 4, s"cluster $c: dropped $droppedN of $n")
    }
  }
}
