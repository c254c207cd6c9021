package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the sketch-aggregate error behavior backing `sketch_approx_agg`:
  * HLL++ distinct counts land within the 3σ envelope of their configured
  * rsd, exactly-sparse small cardinalities are exact, and approx
  * percentiles return an actual data value inside the exact IQR. Both
  * sketches must be deterministic across re-runs (the cross-engine compare
  * depends on it). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct: exact in sparse range, within 3*rsd when dense") {
    val small = (1 to 100).map(i => i % 37).toDF("v")
    val smallOut = small.agg(approx_count_distinct(col("v"), 0.05)).head.getLong(0)
    assert(smallOut === 37L) // sparse-mode HLL++ is exact at tiny cardinality

    val big = (1 to 200000).map(i => i % 50000).toDF("v")
    val est = big.agg(approx_count_distinct(col("v"), 0.05)).head.getLong(0)
    assert(math.abs(est - 50000L) <= 0.15 * 50000) // 3 sigma at rsd 0.05
  }

  test("approx_count_distinct is deterministic across re-runs") {
    val df = (1 to 50000).map(i => i % 12345).toDF("v")
    val a = df.agg(approx_count_distinct(col("v"), 0.05)).head.getLong(0)
    val b = df.agg(approx_count_distinct(col("v"), 0.05)).head.getLong(0)
    assert(a === b)
  }

  test("percentile_approx returns a data value inside the exact IQR") {
    val df = (1 to 10001).map(_.toDouble).toDF("v")
    val row = df.agg(
      percentile_approx(col("v"), lit(0.5), lit(10000)).as("p50a"),
      expr("percentile(v, 0.25)").as("p25"),
      expr("percentile(v, 0.75)").as("p75")).head
    val (p50a, p25, p75) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(p50a >= p25 && p50a <= p75)
    assert(p50a == p50a.floor) // an actual element of 1..10001, not interpolated
  }
}
