package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join: for each left row, attach the single right row with
  * the greatest right timestamp ≤ the left timestamp within the same key
  * group (the time-series enrichment operator — "price as of the trade",
  * "last click before the purchase"). Left rows with no prior right row are
  * kept with NULL right columns (left-outer semantics).
  *
  * Spark has no ASOF JOIN operator; the naive encodings are an inequality
  * join + per-left-row argmax (the join output is |L|×|R| per key before the
  * argmax prunes it) or a broadcast nested loop. This implementation is the
  * scale-correct form: UNION the two sides, then ONE window pass per key in
  * timestamp order carrying the last-seen right payload forward
  * (`last(..., ignoreNulls)` over rows unbounded-preceding..current).
  *
  * 100 TB design: exactly one shuffle (by key) + one linear in-partition
  * sorted pass, regardless of how many right rows precede each left row —
  * the same shape as distributed sort-merge ASOF implementations in
  * time-series engines. Skewed keys salt like any other window (see
  * [[Salting]]).
  *
  * Tie discipline: right rows sort BEFORE left rows at equal timestamps, so
  * the match predicate is inclusive (right.ts ≤ left.ts). Callers must
  * dedupe the right side to one row per (key, ts) — with duplicates the
  * carried row would be partition-order-dependent (the same ambiguity
  * DuckDB's ASOF JOIN has).
  */
object AsOfJoin {

  /** @param left      rows to enrich; all its columns pass through
    * @param right     rows to attach; all its columns emerge as `prev_<col>`
    * @param key       equi-join key column present on both sides
    * @param ts        timestamp (or any ordered) column present on both sides
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields)
    val l = left.select(
      col(key).as("__key"), col(ts).as("__ts"), lit(1).as("__side"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val r = right.select(
      col(key).as("__key"), col(ts).as("__ts"), lit(0).as("__side"),
      lit(null).cast(lStruct).as("__l"),
      struct(rCols.map(col): _*).as("__r"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(
        lCols.map(c => col("__l").getField(c).as(c)) ++
          rCols.map(c => col("__m").getField(c).as(s"prev_$c")): _*)
  }
}
