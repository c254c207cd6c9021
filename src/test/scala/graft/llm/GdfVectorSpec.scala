package graft.llm

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the connector's FLOAT VECTOR column (gdf TagFloatArray, r16):
  * bit-exact embedding round-trip through the columnar format, column
  * pruning that skips the (largest) vector block when only metadata is
  * read, zone-map file pruning composing with the vector payload, and
  * the end-to-end search equality the graded dsv2_vector_topk entry
  * rides. */
class GdfVectorSpec extends SparkSpec {

  private lazy val viaConnector = DocsDsv2.vectors(spark, sf001)
  private lazy val viaParquet =
    spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  test("bit-exact round-trip of every float component") {
    val a = viaConnector.orderBy(col("vec_id")).collect()
    val b = viaParquet.orderBy(col("vec_id")).collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      val xa = x.getAs[scala.collection.Seq[Float]]("embedding")
      val ya = y.getAs[scala.collection.Seq[Float]]("embedding")
      assert(xa == ya, s"vector ${x.getLong(0)} drifted through the format")
    }
  }

  test("column pruning skips the vector block for metadata-only reads") {
    val raw = spark.read.format("graftdocs")
      .load(DocsDsv2.vecPath(spark, sf001))
    val scan = raw.select(col("doc_id"), col("label"))
      .queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("doc_id", "label"),
      s"vector block survived pruning: ${scan.scan.readSchema()}")
  }

  test("zone-map pruning composes with the vector payload") {
    val raw = spark.read.format("graftdocs")
      .load(DocsDsv2.vecPath(spark, sf001))
    val q = raw.where(col("doc_id") === 42L).select(col("embedding"))
    val scan = q.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }.get
    assert(scan.inputRDD.getNumPartitions == 1,
      "EqualTo should prune to the single hash bucket")
    assert(q.count() == 1L)
  }

  test("brute top-k over the connector equals the parquet baseline") {
    val a = Similarity.bruteTopKOf(viaConnector).collect().map(_.toSeq)
    val b = Similarity.bruteTopKOf(
      viaParquet.repartition(4)).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
