package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.window.WindowExec

import graft.SparkSpec

/** Physical-plan assertions for the r7 scale claims, so they can't rot
  * into comments that no longer match the executed plan (the q16 lesson —
  * see WarehouseSpec's bucketed-join test):
  *  - sketch_approx_agg: the store-partitioned slim cache feeds BOTH
  *    aggregation legs without a single shuffle — the only exchange in
  *    the plan is the final presentation sort.
  *  - corpus_pack: the two-phase prefix sum never plans an unpartitioned
  *    (single-task, whole-relation) window. */
class PlanShapeSpec extends SparkSpec {

  private def withStablePlans[A](body: => A): A = {
    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    try { conf.set("spark.sql.adaptive.enabled", "false"); body }
    finally conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("sketch_approx_agg: zero shuffles besides the presentation sort") {
    withStablePlans {
      val plan = graft.SparkEntry.queries("sketch_approx_agg")(spark, sf001)
        .queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
      assert(exchanges.size == 1,
        s"expected only the orderBy exchange above the cached legs:\n$plan")
      assert(exchanges.head.outputPartitioning.toString.contains("range"),
        s"the surviving exchange should be the presentation sort:\n${exchanges.head}")
    }
  }

  test("q15: monthly and volatility aggregates share one exchange (fused L2+L3)") {
    withStablePlans {
      val plan = graft.SparkEntry.queries("q15_revenue_volatility")(spark, sf001)
        .queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
      // L1 product-month rollup + the explicit store/supplier repartition
      // (satisfying BOTH aggregates above it) + the presentation sort —
      // a 4th exchange means the L2/L3 fusion regressed
      assert(exchanges.size == 3,
        s"expected exactly 3 exchanges (L1 agg, fused L2+L3 repartition, sort):\n$plan")
    }
  }

  test("corpus_pack: no unpartitioned window at any stage") {
    withStablePlans {
      val plan = graft.SparkEntry.queries("corpus_pack")(spark, sf001)
        .queryExecution.executedPlan
      val windows = plan.collect { case w: WindowExec => w }
      assert(windows.nonEmpty, s"expected the in-bucket prefix-sum window:\n$plan")
      windows.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"unpartitioned window would serialize the corpus onto one task:\n$w")
      }
    }
  }
}
