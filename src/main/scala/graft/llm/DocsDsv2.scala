package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** The corpus materialized through the custom `graftdocs` DataSourceV2
  * connector ([[org.apache.spark.sql.graft.dsv2.GraftDocsSource]]): a
  * per-(session, sf) index-artifact build (the [[graft.SessionMemo]]
  * discipline) that writes the documents table hash-bucketed by
  * `pmod(doc_id, Buckets)` — the connector's write path plans the
  * cluster-by-bucket exchange and doc_id sort itself via
  * RequiresDistributionAndOrdering — and serves reads through the
  * connector's pruning/pushdown/reported-partitioning scan. The
  * `dsv2_text_stats` graded entry consumes [[docs]] with the SAME
  * arithmetic and oracle as text_stats, so a green entry certifies the
  * whole connector round-trip bit-for-bit. */
object DocsDsv2 {

  /** Bucket count: small enough that the sf0.01 corpus still puts
    * dozens of rows per file, large enough to exercise real pruning. */
  val Buckets = 8

  /** Weakly session-keyed — see [[graft.SessionMemo]]. */
  private val built = new graft.SessionMemo[String]

  /** Write-once per (session, sf); returns the table path. */
  def path(s: SparkSession, dir: String): String =
    built.getOrElseUpdate(s, dir) {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_") +
        "_" + Integer.toHexString(dir.hashCode)
      val p = s"/root/repo/target/graft-dsv2/$tag"
      s.read.parquet(s"$dir/documents.parquet")
        .withColumn("bucket",
          pmod(col("doc_id"), lit(Buckets.toLong)).cast(IntegerType))
        .write.format("graftdocs")
        .option("buckets", Buckets.toString)
        .mode("overwrite")
        .save(p)
      p
    }

  /** The corpus read THROUGH the connector (schema = documents + the
    * bucket layout column, which consumers prune away). */
  def docs(s: SparkSession, dir: String): DataFrame =
    s.read.format("graftdocs").load(path(s, dir))
}
