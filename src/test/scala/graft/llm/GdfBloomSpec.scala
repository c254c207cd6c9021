package graft.llm

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the per-file BLOOM FILTERS (r17): under the hash layout a
  * point lookup on a value-spread column cannot prune by [min,max] —
  * the manifest blooms must do it — with the superset guarantee (no
  * false negatives, residual re-evaluation keeps row-level semantics
  * exact). */
class GdfBloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val p = s"/tmp/graft-bloom-spec-${System.nanoTime()}"
    // val = 7·doc_id: every file's [min,max] val span covers nearly the
    // whole range (ids hash-spread mod 4), so only the bloom can prune
    (0L until 40L).map(i => (i, 7L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)
    p
  }

  private def t = spark.read.format("graftdocs").load(dir)

  private def filesRead(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))
      .inputRDD.getNumPartitions

  test("a present value reads only its own file (plus any bloom fp)") {
    // val = 7·9 = 63 lives with doc_id 9 -> bucket 1, one file
    val q = t.where(col("val") === 63L)
    val read = filesRead(q)
    assert(read >= 1 && read <= 2, s"expected ~1 file, read $read")
    assert(q.select(col("doc_id")).collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("an absent in-range value prunes every file") {
    // 100 is inside every file's [min,max] but 100 % 7 != 0: only the
    // blooms can reject it (fp odds at 80 probed bits / 4096 are ~0 and
    // deterministic for this constant)
    val q = t.where(col("val") === 100L)
    assert(filesRead(q) == 0, "blooms should prune an absent value")
    assert(q.count() == 0L)
  }

  test("no false negatives across every planted value") {
    (0L until 40L).foreach { i =>
      val got = t.where(col("val") === 7L * i)
        .select(col("doc_id")).collect().map(_.getLong(0))
      assert(got.toSeq == Seq(i), s"value ${7 * i} lost row $i")
    }
  }

  test("range predicates ignore blooms (zone maps only)") {
    // every file's span covers [70, 210] -> no pruning, exact rows
    val q = t.where(col("val") >= 70L && col("val") <= 210L)
    assert(filesRead(q) == 4)
    assert(q.count() == 21L)
  }

  // ---- r19: string-equality file pruning ---------------------------------

  private lazy val strDir = {
    val p = s"/tmp/graft-bloom-str-spec-${System.nanoTime()}"
    // lang is low-cardinality AND bucket-correlated: buckets 0/1 hold
    // only 'aa', buckets 2/3 only 'bb' — an equality on lang can halve
    // the file set, but only the string bloom can see it (no zone maps
    // for strings); 'text' is all-distinct (above the 256-distinct
    // bloom cap) so it must NOT prune
    (0L until 1200L).map(i =>
        (i, if (i % 4 <= 1) "aa" else "bb", s"unique-text-$i"))
      .toDF("doc_id", "lang", "text")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("overwrite").save(p)
    p
  }

  private def ts = spark.read.format("graftdocs").load(strDir)

  test("string equality prunes whole files through the string bloom (r19)") {
    val q = ts.where(col("lang") === "aa")
    val read = filesRead(q)
    assert(read <= 2, s"lang='aa' lives in 2 of 4 files, read $read")
    assert(q.count() == 600L)
    // an absent value prunes everything (fp odds ~0 for this constant)
    val none = ts.where(col("lang") === "zz")
    assert(filesRead(none) == 0, "an absent string must prune every file")
    assert(none.count() == 0L)
  }

  test("no string false negatives; high-cardinality strings never prune") {
    Seq("aa", "bb").foreach { v =>
      val got = ts.where(col("lang") === v).count()
      assert(got == 600L, s"lang=$v must serve all its rows, got $got")
    }
    // text is above the per-file distinct cap: no bloom, no pruning
    val q = ts.where(col("text") === "no-such-text")
    assert(filesRead(q) == 4,
      "a bloom-less string column cannot prune (superset guarantee)")
    assert(q.count() == 0L)
  }
}
