package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: match each point to every interval
  * containing it (`start ≤ p < end`). Spark plans a raw inequality join as
  * a broadcast nested loop (or worse, a cartesian product) — O(|P|·|I|)
  * comparisons.
  *
  * This is the bucketed encoding: explode each interval into the fixed-width
  * buckets it overlaps, bucket each point, equi-join on the bucket id, then
  * apply the exact containment predicate. The inequality join becomes a hash
  * join whose cost is |P| + Σ interval-widths/bucket-width, and every pair
  * examined is already bucket-local. No dedup is needed: a (point, interval)
  * pair meets in exactly one bucket — the point's.
  *
  * 100 TB design: the shuffle key is the bucket — time-uniform data spreads
  * evenly; the bucket width trades interval replication (wide intervals ÷
  * width) against join selectivity. At warehouse scale the same idea is a
  * storage layout (partition facts by time bucket → interval probes become
  * partition pruning, exactly like [[graft.llm.Similarity.ivfTopK]]'s
  * centroid lists).
  */
object RangeJoin {

  /** @param points      relation containing `ptCol`
    * @param intervals   relation containing `startCol`/`endCol`; intervals
    *                    are half-open [start, end)
    * @param ptCol       LONG point coordinate (e.g. epoch micros)
    * @param startCol    LONG inclusive start
    * @param endCol      LONG exclusive end
    * @param bucketWidth bucket size in the same units
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor((col(endCol) - 1) / bucketWidth))))
    val pt = points.withColumn("__bucket", floor(col(ptCol) / bucketWidth))
    pt.join(iv, "__bucket")
      .where(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
