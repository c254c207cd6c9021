package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{functions => gf}
import org.apache.spark.util.sketch.BloomFilter

import graft.SparkSpec

/** Pins the native Bloom tier ([[org.apache.spark.sql.graft.BloomBuildAgg]]
  * + [[org.apache.spark.sql.graft.BloomMightContainLong]]): the
  * no-false-negatives guarantee, distributed-merge equivalence with a
  * sequential single-JVM build, codegen/interpreted probe parity, and the
  * exactness of the prefilter+confirm composition
  * ([[Corpus.decontaminateBloom]] vs [[Corpus.decontaminate]]). */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val items = (1L to 5000L).map(i => i * 2654435761L)

  private def buildBytes(partitions: Int): Array[Byte] =
    items.toDF("h").repartition(partitions)
      .agg(gf.bloom_build(col("h"), 1L << 16, 0.03).as("f"))
      .head().getAs[Array[Byte]](0)

  test("no false negatives, across any partitioning") {
    val bytes = buildBytes(13)
    val f = BloomFilter.readFrom(bytes)
    items.foreach(h => assert(f.mightContainLong(h)))
  }

  test("distributed merge equals a sequential single-JVM build") {
    val seq = BloomFilter.create(1L << 16, 0.03)
    items.foreach(seq.putLong)
    val out = new java.io.ByteArrayOutputStream()
    seq.writeTo(out)
    assert(buildBytes(13).toSeq === out.toByteArray.toSeq)
    assert(buildBytes(1).toSeq === out.toByteArray.toSeq)
  }

  test("probe expression agrees with the filter, codegen and interpreted") {
    val bytes = buildBytes(4)
    val f = BloomFilter.readFrom(bytes)
    val probes = (items.take(100) ++ (1L to 100L).map(_ * 7919L + 3L)).toDF("h")
    for (codegen <- Seq("FALLBACK", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen == "FALLBACK")
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val got = probes
          .select(col("h"), gf.bloom_might_contain(lit(bytes), col("h")).as("m"))
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        got.foreach { case (h, m) => assert(m === f.mightContainLong(h)) }
        // every inserted probe answers true under the expression too
        items.take(100).foreach(h => assert(got(h)))
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
  }

  test("non-foldable filter argument is rejected at analysis time") {
    val bytes = buildBytes(1)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((bytes, 1L)).toDF("f", "h")
        .select(gf.bloom_might_contain(col("f"), col("h")))
        .collect()
    }
    assert(e.getMessage.contains("foldable"))
  }

  test("decontaminateBloom output is byte-identical to the exact path") {
    val dir = "/root/testdata/sf0.001"
    val a = Corpus.decontaminate(spark, dir).collect().toSeq
    val b = Corpus.decontaminateBloom(spark, dir).collect().toSeq
    assert(a === b)
  }
}
