package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** The fused native 60-bit hash must be BIT-identical to the composed
  * `conv(substr(md5(x),1,15),16,10)` form — every oracle-checked hash
  * (shingle base hashes, minhash permutations, stratified-sample buckets)
  * depends on the two agreeing. */
class Md5PrefixExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def composed(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  test("fused == composed on every sf0.001 document text and doc_id") {
    val d = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("text"), col("doc_id").cast("string").as("id"))
    val bad = d.select(
        org.apache.spark.sql.graft.functions.md5_prefix64(col("text")).as("f"),
        composed(col("text")).as("c"),
        org.apache.spark.sql.graft.functions.md5_prefix64(col("id")).as("f2"),
        composed(col("id")).as("c2"))
      .where(col("f") =!= col("c") || col("f2") =!= col("c2"))
    assert(bad.count() == 0)
  }

  test("fused == composed on edge strings (empty, unicode, long)") {
    val rows = Seq("", "a", "über-ß-∆", "x" * 10000, "smp|123", "0")
    val bad = rows.toDF("s").select(
        org.apache.spark.sql.graft.functions.md5_prefix64(col("s")).as("f"),
        composed(col("s")).as("c"))
      .where(col("f") =!= col("c"))
    assert(bad.count() == 0)
  }

  test("always a positive 60-bit value; null propagates") {
    val r = Seq("anything").toDF("s")
      .select(org.apache.spark.sql.graft.functions.md5_prefix64(col("s")))
      .collect().head.getLong(0)
    assert(r >= 0L && r < (1L << 60))
    val n = Seq(Option.empty[String]).toDF("s")
      .select(org.apache.spark.sql.graft.functions.md5_prefix64(col("s")))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("survives with codegen disabled (interpreted path)") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val bad = Seq("interp", "").toDF("s").select(
          org.apache.spark.sql.graft.functions.md5_prefix64(col("s")).as("f"),
          composed(col("s")).as("c"))
        .where(col("f") =!= col("c"))
      assert(bad.count() == 0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
