package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the bottom-k quantile sketch (r20,
  * TextAnalysis.quantileSketchOf): small-input exactness (a corpus
  * under k IS its own sample), the integer order-statistic index rule,
  * the two-level tournament's exactness against a brute bottom-k, the
  * DKW certification holding on a past-k corpus, monotonicity of the
  * estimates, and sample mergeability — the properties that make
  * fixed-k bottom-k the distributed-quantile currency. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(rows: Seq[(Long, Long)]) =
    TextAnalysis.quantileSketchOf(rows.toDF("doc_id", "n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(8), r.getDouble(9), r.getBoolean(10)))

  test("a corpus under k is its own sample: exact quantiles, rank_err 0") {
    val rows = (1L to 40L).map(i => (i, i * 10L)) // values 10..400
    val got = sketch(rows)
    assert(got.map(_._3).toSet == Set(40L), "m must be the corpus size")
    // ceil(p*40): 10, 20, 30, 36, 40 -> values 100, 200, 300, 360, 400
    assert(got.map(t => t._1 -> t._2).toMap ==
      Map(250L -> 100L, 500L -> 200L, 750L -> 300L, 900L -> 360L,
        990L -> 400L),
      s"under-k estimates must be the exact order statistics, got " +
        got.mkString(", "))
    assert(got.forall(t => t._5 == 0.0 && t._7),
      "sample == corpus must certify with zero rank error")
  }

  test("past k: tournament sample equals brute bottom-k; bound holds") {
    val rows = (1L to 5000L).map(i => (i, (i * i) % 997L)) // skewed values
    val d = rows.toDF("doc_id", "n_chars")
    val got = TextAnalysis.quantileSketchOf(d).collect()
    assert(got.forall(_.getLong(2) == TextAnalysis.QskK) &&
      got.forall(_.getLong(3) == 5000L))
    // brute: the k smallest hashes' values, sorted — the tournament
    // must have selected exactly this sample
    val brute = d.select(col("n_chars"),
        Text.hash64(concat(lit("qsk|"), col("doc_id").cast("string")))
          .as("h"))
      .orderBy(col("h")).limit(TextAnalysis.QskK)
      .select(col("n_chars")).as[Long].collect().sorted
    val wantEst = TextAnalysis.QskPMille.map(p =>
      p -> brute(((p * brute.length + 999) / 1000).toInt - 1)).toMap
    assert(got.map(r => r.getLong(0) -> r.getLong(1)).toMap == wantEst,
      "estimates must be the brute bottom-k sample's order statistics")
    // the DKW certification is COMPUTED in the output; on this fixture
    // (seed-free, reproducible) every rank lands inside the bound
    assert(got.forall(_.getBoolean(10)),
      s"rank_err exceeded eps: ${got.mkString(", ")}")
    // estimates are nondecreasing in p
    val est = got.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(est.zip(est.tail).forall { case (a, b) => a <= b })
  }

  test("degenerate inputs: all-ties certify exactly; empty corpus is empty") {
    // every value equal: each estimate is that value, both rank
    // fractions are 1.0, rank_err 0 — the certification degenerates
    // gracefully instead of dividing into noise
    val ties = sketch((1L to 10L).map(i => (i, 7L)))
    assert(ties.forall(t => t._2 == 7L && t._5 == 0.0 && t._7),
      s"all-ties must certify with zero rank error, got ${ties.mkString(", ")}")
    // empty corpus: no sample rows reach the final join -> zero output
    // rows (not a crash, not a null row) — the same contract as an
    // empty GROUP BY
    val empty = TextAnalysis.quantileSketchOf(
      Seq.empty[(Long, Long)].toDF("doc_id", "n_chars")).collect()
    assert(empty.isEmpty,
      s"an empty corpus must produce an empty sketch, got ${empty.length} rows")
  }

  test("mergeable: re-taking bottom-k of two corpora's unions = direct") {
    def bottomK(ids: Seq[Long]): Seq[Long] =
      ids.toDF("doc_id")
        .select(Text.hash64(concat(lit("qsk|"), col("doc_id")
          .cast("string"))).as("h"))
        .orderBy(col("h")).limit(TextAnalysis.QskK)
        .as[Long].collect().toSeq
    val a = (1L to 2000L)
    val b = (1500L to 3500L) // overlap
    val merged = (bottomK(a) ++ bottomK(b)).distinct.sorted
      .take(TextAnalysis.QskK)
    val direct = bottomK((a ++ b).distinct).sorted
    assert(merged == direct,
      "union of sketches re-taken must equal the union's direct sketch")
  }
}
