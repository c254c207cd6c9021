package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AsOfJoinExec, AsOfJoinNative}

import graft.SparkSpec

/** Pins the native as-of operator ([[AsOfJoinNative]] — custom logical
  * node + planner strategy + merge exec) against the composed
  * union+window form ([[AsOfJoin]]): identical output on hand fixtures
  * (ties, no-match lefts, multi-right runs), on randomized data, and on
  * the self-source shape the registered entry uses; plus a plan
  * assertion that the strategy actually planned the custom exec. */
class NativeAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: DataFrame) =
    df.orderBy(df.columns.map(col).toSeq: _*).collect().map(_.toSeq).toSeq

  private def both(l: DataFrame, r: DataFrame): (Seq[Seq[Any]], Seq[Seq[Any]]) = (
    sortedRows(AsOfJoin.backward(l, r, "k", "t")),
    sortedRows(AsOfJoinNative.backward(l, r, "k", "t")))

  test("hand fixture: ties inclusive, carries latest, left-outer nulls") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 7L, "d"))
      .toDF("k", "t", "payload")
    val r = Seq((1L, 10L, 100L), (1L, 15L, 150L), (3L, 1L, 999L))
      .toDF("k", "t", "rv")
    val (composed, native) = both(l, r)
    assert(native === composed)
    // spot semantics: t=10 matches the tie (inclusive); t=20 the latest
    // ≤ 20; t=5 and key 2 match nothing
    val byLeft = native.map(s => (s(0), s(1)) -> s(5)).toMap
    assert(byLeft((1L, 10L)) === 100L)
    assert(byLeft((1L, 20L)) === 150L)
    assert(byLeft((1L, 5L)) === null)
    assert(byLeft((2L, 7L)) === null)
  }

  test("randomized cross-check with the composed form") {
    val rnd = new scala.util.Random(77)
    val l = Seq.fill(300)((rnd.nextInt(12).toLong, rnd.nextInt(100).toLong,
      rnd.nextInt(1000))).toDF("k", "t", "payload")
    val r = Seq.fill(200)((rnd.nextInt(12).toLong, rnd.nextInt(100).toLong))
      .distinct // one right row per (key, ts): the shared tie contract
      .map { case (k, t) => (k, t, k * 1000 + t) }
      .toDF("k", "t", "rv")
    val (composed, native) = both(l.repartition(7), r.repartition(3))
    assert(native === composed)
  }

  test("self-source shape (both sides from one relation) plans and agrees") {
    val ev = Seq.fill(200)((scala.util.Random.nextInt(8).toLong,
      scala.util.Random.nextInt(50).toLong, scala.util.Random.nextInt(2)))
      .toDF("k", "t", "side")
    val l = ev.where(col("side") === 1).select(col("k"), col("t"),
      (col("k") + col("t")).as("payload"))
    val r = ev.where(col("side") === 0).groupBy(col("k"), col("t"))
      .agg(count(lit(1)).as("rv"))
    val (composed, native) = both(l, r)
    assert(native === composed)
  }

  test("the planner uses AsOfJoinExec with clustered+sorted children") {
    val l = Seq((1L, 1L)).toDF("k", "t")
    val r = Seq((1L, 1L, 2L)).toDF("k", "t", "rv")
    val df = AsOfJoinNative.backward(l, r, "k", "t")
    assert(df.collect().map(_.toSeq).toSeq === Seq(Seq(1L, 1L, 1L, 1L, 2L)))
    // AQE hides the subtree from executedPlan.collect until finalized, so
    // assert on the post-execution plan rendering instead
    val planText = df.queryExecution.executedPlan.toString
    assert(planText.contains("AsOfJoin"), s"native exec missing from:\n$planText")
  }

  test("empty right side yields all-null prev columns") {
    val l = Seq((1L, 1L, "x")).toDF("k", "t", "p")
    val r = Seq.empty[(Long, Long, Long)].toDF("k", "t", "rv")
    val out = AsOfJoinNative.backward(l, r, "k", "t").collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(3) && out.head.isNullAt(4) && out.head.isNullAt(5))
  }
}
