package graft.llm

import graft.SparkSpec

/** Pins the temperature-mix math ([[Corpus.temperatureMixOf]], XLM
  * α = 0.5 sampling) on a two-language fixture with known shares: 90/10
  * token split ⇒ temperature shares √0.9 : √0.1 ≈ 0.75 : 0.25, so the
  * low-resource language is boosted 2.5× and — being the most boosted —
  * keeps EVERY doc (rate exactly 1.0), while the head language's rate
  * lands at (0.75/0.9)/(0.25/0.1) ≈ ⅓. */
class TempMixSpec extends SparkSpec {
  import spark.implicits._

  // 90 en docs + 10 is docs, 10 tokens each → p_en = 0.9, p_is = 0.1
  private val perDoc: Seq[(String, Long, Long)] =
    (0L until 90L).map(i => ("en", i, 10L)) ++
      (90L until 100L).map(i => ("is", i, 10L))

  private lazy val rows = Corpus.temperatureMixOf(
      perDoc.toDF("lang", "doc_id", "n_tokens"))
    .collect()
    .map(r => r.getAs[String]("lang") -> r)
    .toMap

  test("temperature shares follow sqrt(p) and sum to ~1") {
    val qEn = rows("en").getAs[Double]("temp_share")
    val qIs = rows("is").getAs[Double]("temp_share")
    assert(math.abs(qEn - 0.75) < 1e-4)
    assert(math.abs(qIs - 0.25) < 1e-4)
    assert(math.abs(qEn + qIs - 1.0) < 1e-5)
    assert(rows("en").getAs[Double]("share") == 0.9)
    assert(rows("is").getAs[Double]("share") == 0.1)
  }

  test("the most-boosted language keeps everything; the head is downsampled") {
    assert(rows("is").getAs[Double]("sample_rate") == 1.0)
    assert(rows("is").getAs[Long]("n_kept") == 10L)
    assert(rows("is").getAs[Long]("kept_tokens") == 100L)
    val rEn = rows("en").getAs[Double]("sample_rate")
    assert(math.abs(rEn - 1.0 / 3.0) < 1e-3)
    assert(rows("en").getAs[Long]("n_kept") < 90L)
    assert(rows("en").getAs[Long]("n_kept") > 0L)
  }
}
