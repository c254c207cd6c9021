package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A hot grouping key concentrates an entire key's rows in one reduce
  * task; at 100 TB a single celebrity key can stall a stage. Salting
  * splits each key into `saltBuckets` deterministic sub-keys (phase 1
  * pre-aggregates per (key, salt) — the heavy shuffle is spread across
  * `saltBuckets` tasks per key), then phase 2 merges the tiny per-salt
  * partials on the natural key.
  *
  * The salt is derived from a deterministic hash of stable columns (NOT
  * `rand()` — replays and retries must salt identically or at-least-once
  * sinks double-count). Only algebraic aggregates (sum/count/min/max)
  * decompose this way; averages are derived from sum+count at the edge.
  *
  * AQE's skew-join splitting handles the JOIN side of skew at runtime;
  * this handles the AGGREGATION side, and works under static plans too.
  */
object Salting {

  /** `df.groupBy(keys).agg(sum(valueCol))` with a salted first phase.
    * `saltFrom` must be stable, high-cardinality columns (e.g. the fact's
    * natural key) so rows of a hot key spread evenly and deterministically. */
  def saltedSum(
      df: DataFrame,
      keys: Seq[Column],
      valueCol: Column,
      resultName: String,
      saltFrom: Seq[Column],
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltFrom: _*), lit(saltBuckets)))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(valueCol).as("__partial"))
    phase1
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as(resultName))
  }
}
