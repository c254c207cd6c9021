package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins Rocchio pseudo-relevance feedback ([[Similarity.prfFrom]]) on
  * planted vectors where query drift must SURFACE a new doc: the
  * feedback top-5 sit at ~60° (four docs) and −65° (one doc) from the
  * query; q′ = q + 0.75·μ drifts ~16° toward the majority cluster, so
  * the doc at 85° (outside the original top-5) overtakes the −65° doc —
  * the classic PRF recall win, visible as a was_feedback=false row in
  * the final top-5 and the dropped feedback doc absent. */
class PrfSpec extends SparkSpec {
  import spark.implicits._

  private def onAngle(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f)
  }

  private val planted: Seq[(Long, Array[Float])] =
    (0L until Similarity.QueryCount.toLong).map { q =>
      q -> (if (q == 0L) onAngle(0) else Array(0f, 0f, 1f, 0f))
    } ++ Seq(100L -> onAngle(58), 101L -> onAngle(59),
      102L -> onAngle(61), 103L -> onAngle(62),
      201L -> onAngle(-65), // 5th-closest: in the feedback set
      200L -> onAngle(85) // outside top-5 until the query drifts
    ) ++ (300L to 309L).map(i => i -> onAngle(180))

  private lazy val (brute, prf) = {
    val e = planted.toDF("vec_id", "embedding")
    val b = Similarity.bruteTopKOf(e)
    (b.where(col("query_id") === 0L).collect()
       .map(_.getAs[Long]("neighbor_id")).toSet,
      Similarity.prfFrom(e, Similarity.bruteTopKOf(e))
        .where(col("query_id") === 0L).collect())
  }

  test("planted premise: brute top-5 is the 60° cluster plus the −65° doc") {
    assert(brute == Set(100L, 101L, 102L, 103L, 201L))
  }

  test("feedback drift surfaces the 85° doc and drops the −65° doc") {
    val ids = prf.map(_.getAs[Long]("neighbor_id")).toSet
    assert(ids.contains(200L), "85° doc must enter the final top-5")
    assert(!ids.contains(201L), "−65° doc must drop out after drift")
    val surfaced = prf.filter(!_.getAs[Boolean]("was_feedback"))
    assert(surfaced.map(_.getAs[Long]("neighbor_id")).toSet == Set(200L))
  }

  test("feedback docs re-rank to the top with ranks 1..4") {
    val fbRanks = prf.filter(_.getAs[Boolean]("was_feedback"))
      .map(_.getAs[Long]("rnk")).sorted.toSeq
    assert(fbRanks == Seq(1L, 2L, 3L, 4L))
    assert(prf.map(_.getAs[Long]("rnk")).sorted.toSeq ==
      (1L to Similarity.TopK.toLong))
  }
}
