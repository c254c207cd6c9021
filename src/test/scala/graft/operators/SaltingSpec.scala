package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted aggregation must be value-identical to the direct aggregation
  * (exact types) and deterministic across replays. */
class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted sum == direct sum on a skewed decimal dataset") {
    // 90% of rows share one hot key
    val df = (0 until 10000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 50}" else "hot"
      (k, BigDecimal(i % 97).setScale(2))
    }.toDF("k", "v")
    val direct = df.groupBy(col("k")).agg(sum(col("v")).as("s"))
      .orderBy("k").collect()
    val salted = Salting.saltedSum(df, Seq(col("k")), col("v"), "s",
      saltFrom = Seq(col("v"), col("k")), saltBuckets = 16)
      .orderBy("k").collect()
    assert(salted.sameElements(direct))
  }

  test("salting is deterministic across replays (no rand())") {
    val df = (0 until 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val a = Salting.saltedSum(df, Seq(col("k")), col("v"), "s",
      saltFrom = Seq(col("v"))).collect()
    val b = Salting.saltedSum(df, Seq(col("k")), col("v"), "s",
      saltFrom = Seq(col("v"))).collect()
    assert(a.sameElements(b))
  }
}
