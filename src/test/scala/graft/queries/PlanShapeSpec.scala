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

  test("sketch_approx_agg: zero shuffles besides the presentation repartition(1)") {
    withStablePlans {
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      val plan = graft.SparkEntry.queries("sketch_approx_agg")(spark, sf001)
        .queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
      // the single exchange is the 8-row presentation repartition(1) —
      // NOT a rangepartitioning (whose sampling job cost ~0.5s/run, r8)
      // and NOT anything under the legs or the leg-fusing merge join
      assert(exchanges.size == 1,
        s"expected only the presentation repartition above the cached legs:\n$plan")
      assert(exchanges.head.outputPartitioning.numPartitions == 1 &&
        !exchanges.head.outputPartitioning.toString.contains("range"),
        s"the surviving exchange should be the single-partition presentation:\n${exchanges.head}")
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty,
        s"the legs must fuse via a zero-exchange sort-merge join:\n$plan")
      smj.foreach { j =>
        assert(j.collect { case e: ShuffleExchangeLike => e }.isEmpty,
          s"no exchange may appear under the leg-fusing join:\n$j")
      }
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

  test("text_unigram_surprisal: per-doc agg rides the index clustering (zero shuffles)") {
    withStablePlans {
      val plan = graft.SparkEntry.queries("text_unigram_surprisal")(spark, sf001)
        .queryExecution.executedPlan
      // the tf index is RANGE-partitioned by doc_id at build time (r12),
      // the model joins are broadcast, the per-doc agg rides the index
      // clustering, and the doc_id-ordered finish is a LOCAL sort over
      // the range partitions — so ABOVE the persisted index there are NO
      // shuffles at all beyond the 1-row SinglePartition scalar (total
      // tokens, vocab-sized input)
      val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
        .filterNot(_.outputPartitioning.toString.contains("SinglePartition"))
      assert(exchanges.isEmpty,
        s"expected no exchange above the persisted index:\n$plan")
      val sorts = plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }
      assert(sorts.nonEmpty && sorts.forall(!_.global),
        s"the presentation sort must be local (range-clustered input):\n$plan")
    }
  }

  test("corpus_line_dedup: boilerplate flag join broadcasts; no extra shuffles") {
    withStablePlans {
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
      val plan = graft.SparkEntry.queries("corpus_line_dedup")(spark, sf001)
        .queryExecution.executedPlan
      assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"the frequent-line flag join must broadcast the boilerplate set:\n$plan")
      assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
        s"a sort-merge join here means the line relation shuffled on content hash:\n$plan")
      // line-hash count (inside the broadcast build side) + per-doc rebuild
      // + presentation sort — a 4th exchange means the rebuild stopped
      // riding the scan/aggregation keys (the operator deliberately has no
      // round-robin re-spread; see the A/B note on Corpus.lineDedup)
      val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
      assert(exchanges.size == 3,
        s"expected exactly 3 keyed exchanges (line count, doc rebuild, sort):\n$plan")
    }
  }

  test("bm25 and decontaminate read their session indexes, not the corpus") {
    withStablePlans {
      import org.apache.spark.sql.execution.FileSourceScanExec
      // both entries sell a "corpus scanned once per session, served from a
      // persisted index" story — a direct documents.parquet scan in the
      // executed plan means a consumer stopped reading the index
      Seq("corpus_bm25_topk", "corpus_decontaminate").foreach { name =>
        val plan = graft.SparkEntry.queries(name)(spark, sf001)
          .queryExecution.executedPlan
        val corpusScans = plan.collect {
          case f: FileSourceScanExec
              if f.relation.location.inputFiles.exists(_.contains("documents")) => f
        }
        assert(corpusScans.isEmpty,
          s"$name re-scans the corpus instead of its persisted index:\n$plan")
      }
    }
  }

  test("text_bpe_pairs: distributed top-k, no global sort of the pair table") {
    withStablePlans {
      import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
      val plan = graft.SparkEntry.queries("text_bpe_pairs")(spark, sf001)
        .queryExecution.executedPlan
      assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
        s"pair ranking must be per-partition heads + k-row merge:\n$plan")
    }
  }

  test("events_props_json: scan reads only the referenced columns") {
    withStablePlans {
      import org.apache.spark.sql.execution.FileSourceScanExec
      val plan = graft.SparkEntry.queries("events_props_json")(spark, sf001)
        .queryExecution.executedPlan
      val scans = plan.collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty)
      scans.foreach { f =>
        assert(f.requiredSchema.fieldNames.toSet === Set("event_type", "props"),
          s"JSON extraction must prune the scan to (event_type, props):\n$f")
      }
    }
  }

  test("corpus_doc_features: id-keyed equi-join, never a nested-loop product") {
    withStablePlans {
      import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
      val plan = graft.SparkEntry.queries("corpus_doc_features")(spark, sf001)
        .queryExecution.executedPlan
      assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
        s"the feature zip must stay an equi-join on the record id:\n$plan")
    }
  }

  test("similarity_hybrid_rrf: top-k legs plan as TakeOrderedAndProject; unpartitioned windows only below a top-k bound") {
    withStablePlans {
      import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
      val plan = graft.SparkEntry.queries("similarity_hybrid_rrf")(spark, sf001)
        .queryExecution.executedPlan
      assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
        s"expected distributed top-k (TakeOrderedAndProject) in the legs:\n$plan")
      // the contract-bearing rank form: row_number over the ALREADY-LIMITED
      // k-row relation. An unpartitioned window is fine over k rows and a
      // scale-killer over the corpus — so each one must have a top-k bound
      // (TakeOrderedAndProject) somewhere below it, and its window function
      // must be the ordering-contracted row_number, not a positional id.
      plan.collect { case w: WindowExec => w }.foreach { w =>
        if (w.partitionSpec.isEmpty) {
          assert(w.child.collectFirst { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
            s"unpartitioned window over UNBOUNDED input serializes the corpus:\n$w")
          assert(w.windowExpression.mkString.contains("row_number"),
            s"rank over the limited result must be row_number (ordering contract):\n$w")
        }
      }
    }
  }
}
