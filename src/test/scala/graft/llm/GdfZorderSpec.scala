package graft.llm

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the connector's Z-ORDER clustered layout
  * ([[DocsDsv2.zcelled]] + the graftdocs `layout=zorder` write path) on
  * a PLANTED fixture with known geometry: files-skipped counts for 2-D
  * range boxes on either clustered column, the hash-layout CONTRAST
  * (the same n_chars predicate prunes nothing there — the skipping win
  * is the layout's doing, not the zone maps' alone), EqualTo(doc_id)
  * correctness under zorder (the hash bucket-pin must NOT fire), and
  * exact query results under pruning (superset guarantee + residual
  * re-evaluation). */
class GdfZorderSpec extends SparkSpec {
  import spark.implicits._

  // 64 rows on a correlated diagonal: doc_id 0..63, n_chars = 10·doc_id.
  // Under min-max scaling both dims split at doc_id = 32, so the 8
  // Z-prefix cells are axis-aligned boxes with known occupancy.
  private val rows = (0L until 64L).map(i => (i, 10L * i, s"l${i % 3}"))

  private lazy val zdir = {
    val p = s"/tmp/graft-zorder-spec-${System.nanoTime()}"
    DocsDsv2.zcelled(rows.toDF("doc_id", "n_chars", "lang"))
      .write.format("graftdocs")
      .option("buckets", "8").option("layout", "zorder")
      .mode("overwrite").save(p)
    p
  }

  private lazy val hdir = {
    val p = s"/tmp/graft-hash-spec-${System.nanoTime()}"
    rows.toDF("doc_id", "n_chars", "lang")
      .withColumn("bucket",
        pmod(col("doc_id"), lit(8L)).cast("int"))
      .write.format("graftdocs")
      .option("buckets", "8")
      .mode("overwrite").save(p)
    p
  }

  private def z = spark.read.format("graftdocs").load(zdir)
  private def h = spark.read.format("graftdocs").load(hdir)

  private def filesRead(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))
      .inputRDD.getNumPartitions

  private lazy val zFiles = filesRead(z)

  test("a doc_id range box skips most Z-cells") {
    // doc_id <= 15 is the lowest quarter of the first dimension: only
    // cells whose doc_id half/quarter bits are 0 can hold rows
    val q = z.where(col("doc_id") <= 15L)
    val read = filesRead(q)
    info(s"doc_id box: read $read of $zFiles z-files")
    assert(read < zFiles, "no file was skipped on the doc_id dimension")
    assert(q.count() == 16L)
  }

  test("an n_chars range box skips files — the second-dimension win") {
    val q = z.where(col("n_chars") >= 100L && col("n_chars") <= 200L)
    val read = filesRead(q)
    info(s"n_chars box: read $read of $zFiles z-files")
    assert(read < zFiles,
      "the Z layout must make n_chars predicates file-skippable")
    assert(q.count() == 11L) // n_chars = 100,110,...,200
  }

  test("hash-layout contrast: the same n_chars box prunes nothing") {
    // doc_id hashed mod 8 spreads every n_chars decile across all files
    val hFiles = filesRead(h)
    val read = filesRead(
      h.where(col("n_chars") >= 100L && col("n_chars") <= 200L))
    info(s"hash layout: read $read of $hFiles files")
    assert(read == hFiles,
      "hash files should all survive an n_chars box (wide per-file range)")
  }

  test("2-D box composes both dimensions' pruning") {
    val q = z.where(col("doc_id") <= 31L &&
      col("n_chars") >= 100L && col("n_chars") <= 200L)
    val read2d = filesRead(q)
    val read1d = filesRead(z.where(col("doc_id") <= 31L))
    info(s"2-D box: read $read2d files; doc_id-only: $read1d")
    assert(read2d <= read1d)
    assert(q.count() == 11L)
  }

  test("EqualTo(doc_id) under zorder: no hash bucket-pin misfire") {
    // doc_id 42 lands in a Z-cell unrelated to pmod(42, 8); the hash
    // fast path would prune to the WRONG file and lose the row
    val q = z.where(col("doc_id") === 42L)
    assert(q.count() == 1L)
    assert(q.select(col("n_chars")).collect()(0).getLong(0) == 420L)
  }

  test("the manifest carries n_chars zone maps that match the data") {
    val got = z.where(col("n_chars") > 630L)
    assert(filesRead(got) == 0, "out-of-range n_chars must drop all files")
    assert(got.count() == 0L)
  }
}
