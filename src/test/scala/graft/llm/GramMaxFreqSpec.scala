package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.functions.gram_max_freq
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The native gram-multiplicity kernel must be VALUE-identical to the
  * composable fold formulation it replaced in [[TextAnalysis.repetitionOf]]
  * (the DuckDB oracle is written against that semantics): longest equal
  * run of the sorted gram multiset == max gram multiplicity. */
class GramMaxFreqSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r13 fold formulation, verbatim. */
  private def foldForm(t: Column): Column = {
    val n = size(t)
    val grams = transform(sequence(lit(0), n - 3),
      i => concat_ws(" ", element_at(t, (i + 1).cast(IntegerType)),
        element_at(t, (i + 2).cast(IntegerType)),
        element_at(t, (i + 3).cast(IntegerType))))
    aggregate(
      array_sort(grams),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
  }

  test("kernel == fold on every sf0.001 document") {
    val d = spark.read.parquet(s"$sf001/documents.parquet")
      .where(size(split(col("text"), " ")) >= 3)
      .select(
        gram_max_freq(split(col("text"), " "), 3).as("kernel"),
        foldForm(split(col("text"), " ")).as("fold"))
    assert(d.where(col("kernel") =!= col("fold")).count() === 0)
    assert(d.count() > 100)
  }

  private def run(text: String): Long =
    Seq(text).toDF("t")
      .select(gram_max_freq(split(col("t"), " "), 3))
      .collect().head.getLong(0)

  test("pinned values: loop doc, distinct doc, short doc") {
    assert(run("a b a b a b a b") === 3) // "a b a" x3
    assert(run("v w x y z") === 1)
    assert(run("a b") === 0) // fewer than k tokens: zero grams
  }

  test("interpreted path matches codegen") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run("a b a b a b a b") === 3)
    finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
