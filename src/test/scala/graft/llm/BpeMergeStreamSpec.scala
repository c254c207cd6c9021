package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.functions.bpe_merge_stream

import graft.SparkSpec

/** Pins the [[org.apache.spark.sql.graft.BpeMergeStream]] kernel: greedy
  * left-to-right non-overlap per rule, rank-ordered rule application
  * (later rules see earlier merges), merged-symbol rules, empty rule
  * table passthrough, and codegen/interpreted parity. The e2e stream
  * equality with the old regexp chain is pinned by BpeApplySpec through
  * [[TextAnalysis.bpeApplyOf]]. */
class BpeMergeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def merge(text: String, rules: (String, String)*): String =
    Seq(text).toDF("t")
      .select(bpe_merge_stream(split(col("t"), " "),
        typedLit(rules.map(_._1)), typedLit(rules.map(_._2))).as("s"))
      .collect().head.getString(0)

  test("greedy left-to-right, never rescanning its own output") {
    assert(merge("a a a", "a" -> "a") === "a_a a")
    assert(merge("a a a a", "a" -> "a") === "a_a a_a")
  }

  test("rules apply in rank order; later rules see earlier merges") {
    assert(merge("a b c", "a" -> "b", "a_b" -> "c") === "a_b_c")
    // reversed rank order: the merged-symbol rule fires before its input
    // exists, so only the base merge lands
    assert(merge("a b c", "a_b" -> "c", "a" -> "b") === "a_b c")
  }

  test("empty rule table and non-matching rules pass the stream through") {
    assert(merge("x y z") === "x y z")
    assert(merge("x y z", "p" -> "q") === "x y z")
  }

  test("interpreted path matches codegen") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(merge("a a b", "a" -> "a", "a_a" -> "b") === "a_a_b")
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
