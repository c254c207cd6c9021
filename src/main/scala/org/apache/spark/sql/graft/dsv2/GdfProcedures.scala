package org.apache.spark.sql.graft.dsv2

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL STORED PROCEDURES for the graft catalog (r18) — Spark 4's
  * `ProcedureCatalog` surface, the Iceberg `CALL catalog.system.proc`
  * shape: the maintenance verbs an operator runs on a schedule become
  * plain SQL, returning their summary as a result set:
  *
  *   spark.sql("CALL graft.compact('docs')")         // X121 OPTIMIZE
  *   spark.sql("CALL graft.remove_orphans('docs')")  // X131 orphan GC
  *
  * Each bound procedure runs the existing connector verb (never a
  * side-door reimplementation) and serves its summary through a
  * driver-local [[LocalScan]] — the same metadata-result shape as the
  * `$files`/`$snapshots` tables. */
private[dsv2] object GdfProcedures {

  val Names: Seq[String] =
    Seq("compact", "remove_orphans", "create_tag", "drop_tag", "rebucket")

  def load(root: String, name: String): UnboundProcedure = name match {
    case "compact" => new CompactProc(root)
    case "remove_orphans" => new RemoveOrphansProc(root)
    case "create_tag" => new CreateTagProc(root)
    case "drop_tag" => new DropTagProc(root)
    case "rebucket" => new RebucketProc(root)
    case other => throw new UnsupportedOperationException(
      s"unknown graft procedure $other (have: ${Names.mkString(", ")})")
  }

  private def tableDir(root: String, input: InternalRow): String = {
    val t = input.getUTF8String(0).toString
    val dir = new File(root, t)
    require(new File(dir, "manifest.json").exists(),
      s"no graftdocs table '$t' under $root")
    dir.getAbsolutePath
  }

  private def resultScan(resultSchema: StructType,
      resultRows: Array[InternalRow]): java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](new Scan with LocalScan {
      override def readSchema(): StructType = resultSchema
      override def rows(): Array[InternalRow] = resultRows
    }).iterator()

  /** `CALL <cat>.compact('<table>')` → the X121 OPTIMIZE verb; returns
    * one (files_before, files_after) summary row. */
  private class CompactProc(root: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "rewrite fragmented buckets into single sorted files; " +
        "reconcile delete vectors (the OPTIMIZE verb)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      Array(ProcedureParameter.in("table", StringType).build())
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val p = tableDir(root, input)
      val before = GdfManifest.read(p).files.size.toLong
      GdfMaintenance.compact(SparkSession.active, p)
      val after = GdfManifest.read(p).files.size.toLong
      resultScan(
        StructType(Seq(StructField("files_before", LongType),
          StructField("files_after", LongType))),
        Array(InternalRow(before, after)))
    }
  }

  /** `CALL <cat>.rebucket('<table>', <buckets>)` → hash-layout partition
    * evolution (X143); returns one (buckets_before, buckets_after) row. */
  private class RebucketProc(root: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "rebucket"
    override def description(): String =
      "rewrite the table at a new hash bucket count (partition evolution)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      Array(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("buckets",
          org.apache.spark.sql.types.IntegerType).build())
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val p = tableDir(root, input)
      val before = GdfManifest.read(p).buckets
      val n = input.getInt(1)
      GdfMaintenance.rebucket(SparkSession.active, p, n)
      resultScan(
        StructType(Seq(
          StructField("buckets_before", org.apache.spark.sql.types.IntegerType),
          StructField("buckets_after", org.apache.spark.sql.types.IntegerType))),
        Array(InternalRow(before, n)))
    }
  }

  /** `CALL <cat>.create_tag('<table>', '<tag>', <version>)` → pin a
    * retained snapshot under a name (X140); `VERSION AS OF '<tag>'`
    * resolves through it and the snapshot survives retention expiry. */
  private class CreateTagProc(root: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "create_tag"
    override def description(): String =
      "pin a retained snapshot under a named tag (survives expiry)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      Array(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("tag", StringType).build(),
        ProcedureParameter.in("version", org.apache.spark.sql.types.IntegerType)
          .build())
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val p = tableDir(root, input)
      val tag = input.getUTF8String(1).toString
      val v = input.getInt(2)
      GdfMaintenance.createTag(p, tag, v)
      resultScan(
        StructType(Seq(StructField("tag", StringType),
          StructField("pinned_version", org.apache.spark.sql.types.IntegerType))),
        Array(InternalRow(UTF8String.fromString(tag), v)))
    }
  }

  /** `CALL <cat>.drop_tag('<table>', '<tag>')` → unpin; the snapshot
    * becomes expirable at the next commit. */
  private class DropTagProc(root: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "drop_tag"
    override def description(): String = "drop a named tag"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      Array(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("tag", StringType).build())
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val p = tableDir(root, input)
      val tag = input.getUTF8String(1).toString
      GdfMaintenance.dropTag(p, tag)
      resultScan(
        StructType(Seq(StructField("dropped", StringType))),
        Array(InternalRow(UTF8String.fromString(tag))))
    }
  }

  /** `CALL <cat>.remove_orphans('<table>', <older_than_ms>)` → the X131
    * GC verb; returns the removed file names. */
  private class RemoveOrphansProc(root: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "remove_orphans"
    override def description(): String =
      "delete aged data/delete files no retained snapshot references"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      Array(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("older_than_ms", LongType)
          .defaultValue("86400000").build())
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val p = tableDir(root, input)
      val removed = GdfMaintenance.removeOrphans(p, input.getLong(1))
      resultScan(
        StructType(Seq(StructField("removed_file", StringType))),
        removed.map(n => InternalRow(UTF8String.fromString(n))).toArray)
    }
  }
}
