package graft.llm

import graft.SparkSpec

/** Pins the kNN vote ([[Similarity.knnClassifyOf]]): plain majority,
  * the (votes, best-rank, label) tie chain, and the correctness flag. */
class KnnClassifySpec extends SparkSpec {
  import spark.implicits._

  // query 1: labels (A,A,B,B,B) → B by majority
  // query 2: 2-2-1 split — A holds ranks {2,4}, B ranks {1,3} → tie on
  //   votes, B wins on best rank 1
  // query 3: full tie shape — each label once; rank 1 wins
  private val brute = Seq(
    (1L, 101L, 1L), (1L, 102L, 2L), (1L, 103L, 3L), (1L, 104L, 4L),
    (1L, 105L, 5L),
    (2L, 111L, 1L), (2L, 112L, 2L), (2L, 113L, 3L), (2L, 114L, 4L),
    (2L, 115L, 5L),
    (3L, 121L, 1L), (3L, 122L, 2L), (3L, 123L, 3L), (3L, 124L, 4L),
    (3L, 125L, 5L)
  ).toDF("query_id", "neighbor_id", "rnk")

  private val labels = Seq(
    1L -> 7, 2L -> 1, 3L -> 9, // true labels of the queries
    101L -> 7, 102L -> 7, 103L -> 8, 104L -> 8, 105L -> 8,
    111L -> 2, 112L -> 1, 113L -> 2, 114L -> 1, 115L -> 3,
    121L -> 5, 122L -> 4, 123L -> 3, 124L -> 2, 125L -> 1
  ).toDF("vec_id", "label")

  private lazy val rows =
    Similarity.knnClassifyOf(brute, labels).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Int]("true_label"), r.getAs[Int]("pred_label"),
          r.getAs[Long]("votes"), r.getAs[Boolean]("correct"))).toMap

  test("majority vote wins; correctness flag tracks the true label") {
    assert(rows(1L) == ((7, 8, 3L, false))) // 3×label-8 beats 2×label-7
  }

  test("vote ties break on the best neighbor rank") {
    // labels 1 and 2 both have 2 votes; label 2 holds rank 1 → label 2
    assert(rows(2L) == ((1, 2, 2L, false)))
  }

  test("all-distinct neighborhood: rank 1's label wins") {
    assert(rows(3L) == ((9, 5, 1L, false)))
  }
}
