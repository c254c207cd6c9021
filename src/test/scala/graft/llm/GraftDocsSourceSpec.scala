package graft.llm

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Certifies the custom `graftdocs` DataSourceV2 connector
  * ([[org.apache.spark.sql.graft.dsv2.GraftDocsSource]], r14): exact
  * round-trip through the bucketed columnar format, COLUMN PRUNING
  * visible in the scan's ReadSchema, doc_id FILTER PUSHDOWN visible as
  * PushedFilters AND as file-level partition pruning (EqualTo prunes to
  * the single hash bucket), and the REPORTED PARTITIONING removing the
  * shuffle for bucket-aligned consumers (key-grouped aggregation and a
  * storage-partitioned self-join, both pinned to ZERO exchanges under
  * `spark.sql.sources.v2.bucketing.enabled`). */
class GraftDocsSourceSpec extends SparkSpec {

  private lazy val viaConnector = DocsDsv2.docs(spark, sf001)
  private lazy val viaParquet =
    spark.read.parquet(s"$sf001/documents.parquet")

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("round-trip: connector read equals the parquet table exactly") {
    val a = viaConnector.select(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars")).orderBy(col("doc_id")).collect()
    val b = viaParquet.select(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars")).orderBy(col("doc_id")).collect()
    assert(a.length == b.length && a.sameElements(b))
  }

  test("column pruning reaches the scan: ReadSchema keeps only used columns") {
    val scan = scanOf(viaConnector.select(col("doc_id"), col("lang")))
    val desc = scan.scan.description()
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("doc_id", "lang"),
      s"pruned schema wrong: ${scan.scan.readSchema()}")
    assert(desc.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"description missing pruned schema: $desc")
    assert(!desc.contains("text"), "text survived pruning")
  }

  test("doc_id pushdown: PushedFilters reported and files pruned to one bucket") {
    val filtered = viaConnector.where(col("doc_id") === 42L)
    val scan = scanOf(filtered)
    assert(scan.scan.description().contains("EqualTo(doc_id,42)"),
      s"pushed filter missing: ${scan.scan.description()}")
    assert(scan.inputRDD.getNumPartitions == 1,
      s"EqualTo should prune to the single pmod bucket, got " +
        s"${scan.inputRDD.getNumPartitions}")
    // the residual re-evaluation keeps row-level semantics exact
    assert(filtered.count() == 1L)
    // range pushdown prunes by the doc_id zone maps: with doc_id hashed
    // across buckets every file spans a wide range, but an out-of-range
    // predicate must drop ALL files
    val none = scanOf(viaConnector.where(col("doc_id") > 1000000L))
    assert(none.inputRDD.getNumPartitions == 0, "zone maps did not prune")
  }

  test("reported partitioning: bucket-keyed aggregation runs with no shuffle") {
    withConf("spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val agg = viaConnector.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      val exchanges = agg.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"key-grouped scan should satisfy the aggregate's distribution:\n" +
          agg.queryExecution.executedPlan)
      // and the numbers are right
      val total = agg.agg(sum(col("n"))).collect()(0).getLong(0)
      assert(total == viaParquet.count())
    }
  }

  test("storage-partitioned self-join on the bucket key has no shuffle") {
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val l = viaConnector.select(col("bucket"), col("doc_id"), col("n_chars"))
      val r = viaConnector.select(col("bucket"), col("doc_id"),
        col("lang").as("lang_r"))
      val joined = l.join(r, Seq("bucket", "doc_id"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"SPJ should run exchange-free:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == viaParquet.count(), "join lost rows")
    }
  }

  test("dsv2_text_stats twin equals text_stats bit for bit") {
    val a = TextAnalysis.statsOf(viaConnector).collect()
    val b = TextAnalysis.stats(spark, sf001).collect()
    assert(a.sameElements(b))
  }

  // the aggregate-pushdown pins read the OPTIMIZED LOGICAL plan (AQE
  // wraps the physical plan of any query with exchanges, hiding nodes
  // from a naive collect): a completely-pushed aggregation REMOVES the
  // logical Aggregate; a declined one keeps it
  private def hasAgg(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isDefined
  private def v2scan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan
    }.getOrElse(fail("no DataSourceV2ScanRelation in plan"))

  test("aggregate pushdown: count/min/max by bucket is metadata-only") {
    // a private table copy whose data files we can destroy
    val dir = java.nio.file.Files.createTempDirectory("gdf-agg-spec").toFile
    try {
      viaParquet
        .withColumn("bucket", pmod(col("doc_id"), lit(8L)).cast("int"))
        .write.format("graftdocs").option("buckets", "8")
        .mode("overwrite").save(dir.getAbsolutePath)
      val truth = viaParquet
        .groupBy(pmod(col("doc_id"), lit(8L)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("mn"),
          max(col("doc_id")).as("mx"))
        .orderBy(col("bucket")).collect()
      // destroy every data file: only the manifest can answer now
      dir.listFiles().filter(_.getName.endsWith(".gdf"))
        .foreach(f => java.nio.file.Files.write(f.toPath, Array.emptyByteArray))
      val t = spark.read.format("graftdocs").load(dir.getAbsolutePath)
      val agg = t.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("mn"),
          max(col("doc_id")).as("mx"))
        .orderBy(col("bucket"))
      assert(!hasAgg(agg), s"aggregate was not pushed:\n${agg.queryExecution.optimizedPlan}")
      assert(v2scan(agg).description().contains("PushedAggregation"),
        "scan description missing PushedAggregation")
      assert(agg.collect().sameElements(truth),
        "manifest-served aggregate diverged from ground truth")
      // global (no grouping) form pushes too
      val g = t.agg(count(lit(1)).as("n"), min(col("doc_id")).as("mn"))
      assert(!hasAgg(g) && g.collect()(0).getLong(0) == viaParquet.count())
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("aggregate pushdown declines when a filter or other aggs are present") {
    // residual filters force the row-level path (stats cannot answer a
    // filtered query) — and the answer is still exact
    val filtered = viaConnector.where(col("doc_id") < 100L)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    assert(hasAgg(filtered), "filtered aggregate must not be pushed")
    assert(filtered.agg(sum(col("n"))).collect()(0).getLong(0) ==
      viaParquet.where(col("doc_id") < 100L).count())
    // an unsupported aggregate (distinct count) keeps the real path
    val distinctd = viaConnector.groupBy(col("bucket"))
      .agg(countDistinct(col("n_chars")).as("d"))
    assert(hasAgg(distinctd), "count distinct must not be pushed")
  }

  test("aggregate pushdown generalizes to any zone-mapped column (r18)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gdf-agg-col").toFile
    try {
      (0L until 40L).map(i => (i, (i * 7 % 100).toInt, s"t$i"))
        .toDF("doc_id", "score", "tag")
        .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
        .write.format("graftdocs").option("buckets", "4")
        .mode("overwrite").save(dir.getAbsolutePath)
      // destroy the data: only the manifest's colStats can answer
      dir.listFiles().filter(_.getName.endsWith(".gdf"))
        .foreach(f => java.nio.file.Files.write(f.toPath, Array.emptyByteArray))
      val t = spark.read.format("graftdocs").load(dir.getAbsolutePath)
      val agg = t.groupBy(col("bucket"))
        .agg(min(col("score")).as("mn"), max(col("score")).as("mx"))
        .orderBy(col("bucket"))
      assert(!hasAgg(agg),
        s"zone-mapped min/max was not pushed:\n${agg.queryExecution.optimizedPlan}")
      // the int column keeps its own type through the metadata answer
      assert(agg.schema("mn").dataType ==
        org.apache.spark.sql.types.IntegerType)
      val got = agg.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      val want = (0L until 40L).map(i => (i, (i * 7 % 100).toInt))
        .groupBy(_._1 % 4).toSeq.sortBy(_._1)
        .map { case (b, rs) =>
          (b.toInt, rs.map(_._2).min, rs.map(_._2).max) }
      assert(got.toSeq == want, "manifest-served column min/max diverged")
      // a column with no zone map (string) refuses -> real aggregation
      assert(hasAgg(t.agg(min(col("tag")))),
        "a stats-less column must keep the real aggregation")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("SUM/AVG serve from per-file exact sums, metadata-only (r19)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gdf-agg-sum").toFile
    try {
      (0L until 40L).map(i =>
          (i, if (i % 10 == 3) None else Some(i * 7 - 50)))
        .toDF("doc_id", "score")
        .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
        .write.format("graftdocs").option("buckets", "4")
        .mode("overwrite").save(dir.getAbsolutePath)
      // destroy the data: only the manifest's colSums can answer
      dir.listFiles().filter(_.getName.endsWith(".gdf"))
        .foreach(f => java.nio.file.Files.write(f.toPath, Array.emptyByteArray))
      val t = spark.read.format("graftdocs").load(dir.getAbsolutePath)
      val agg = t.groupBy(col("bucket"))
        .agg(sum(col("score")).as("s"), count(lit(1)).as("n"))
        .orderBy(col("bucket"))
      assert(!hasAgg(agg),
        s"SUM was not pushed:\n${agg.queryExecution.optimizedPlan}")
      val got = agg.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val want = (0L until 40L)
        .map(i => (i % 4, if (i % 10 == 3) None else Some(i * 7 - 50)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (b, rs) =>
          (b.toInt, rs.flatMap(_._2).sum, rs.size.toLong) }
      assert(got.toSeq == want,
        "manifest-served SUM must skip nulls and match the real fold")
      // an all-null group's sum is SQL NULL, not 0
      val dir2 = java.nio.file.Files.createTempDirectory("gdf-agg-sum2").toFile
      try {
        Seq((0L, None: Option[Long]), (1L, None))
          .toDF("doc_id", "v")
          .withColumn("bucket", lit(0).cast("int"))
          .write.format("graftdocs").option("buckets", "1")
          .mode("overwrite").save(dir2.getAbsolutePath)
        val r = spark.read.format("graftdocs").load(dir2.getAbsolutePath)
          .agg(sum(col("v"))).collect()(0)
        assert(r.isNullAt(0), "sum over only nulls must be NULL")
      } finally { dir2.listFiles().foreach(_.delete()); dir2.delete() }
      // a MoR delete makes the stats physical: the pushdown must refuse
      val dir3 = java.nio.file.Files.createTempDirectory("gdf-agg-sum3").toFile
      try {
        (0L until 8L).map(i => (i, i)).toDF("doc_id", "v")
          .withColumn("bucket", lit(0).cast("int"))
          .write.format("graftdocs").option("buckets", "1")
          .mode("overwrite").save(dir3.getAbsolutePath)
        org.apache.spark.sql.graft.dsv2.GdfMaintenance.deleteWhereMor(
          spark, dir3.getAbsolutePath,
          Array[org.apache.spark.sql.sources.Filter](
            org.apache.spark.sql.sources.EqualTo("doc_id", 3L)))
        val q = spark.read.format("graftdocs").load(dir3.getAbsolutePath)
          .agg(sum(col("v")))
        assert(hasAgg(q), "a dv'd file must refuse the metadata sum")
        assert(q.collect()(0).getLong(0) == 25L, "and the real sum is live")
      } finally { dir3.listFiles().foreach(_.delete()); dir3.delete() }
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  /** r20 (verdict "wrong #3"): COUNT(col) over a NULLABLE column serves
    * the stored per-file NON-NULL counts — serving file row counts was
    * correct only while the translate gate restricted it to doc_id. */
  test("COUNT(nullable col) pushdown serves non-null counts, metadata-only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gdf-agg-cnt").toFile
    try {
      (0L until 40L).map(i =>
          (i, if (i % 4 == 1) None else Some(i * 3)))
        .toDF("doc_id", "score")
        .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
        .write.format("graftdocs").option("buckets", "4")
        .mode("overwrite").save(dir.getAbsolutePath)
      // destroy the data: only the manifest can answer
      dir.listFiles().filter(_.getName.endsWith(".gdf"))
        .foreach(f => java.nio.file.Files.write(f.toPath, Array.emptyByteArray))
      val t = spark.read.format("graftdocs").load(dir.getAbsolutePath)
      val q = t.agg(count(col("score")).as("n"), count(lit(1)).as("all"))
      assert(!hasAgg(q),
        s"COUNT(col) was not pushed:\n${q.queryExecution.optimizedPlan}")
      val r = q.collect()(0)
      assert(r.getLong(0) == 30L,
        s"COUNT(score) must be the NON-NULL count, got ${r.getLong(0)}")
      assert(r.getLong(1) == 40L, "COUNT(*) stays the row count")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("FILTERED aggregate pushes when the predicate is file-aligned (r21)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gdf-agg-flt").toFile
    try {
      // two appends with DISJOINT doc_id ranges -> two files whose zone
      // maps tile the id space: [0,19] and [20,39] (single bucket)
      def batch(lo: Long, hi: Long) =
        (lo until hi).map(i => (i, i * 3))
          .toDF("doc_id", "score").withColumn("bucket", lit(0).cast("int"))
      batch(0L, 20L).write.format("graftdocs").option("buckets", "1")
        .mode("overwrite").save(dir.getAbsolutePath)
      batch(20L, 40L).write.format("graftdocs").option("buckets", "1")
        .mode("append").save(dir.getAbsolutePath)
      // destroy the data: only the manifest can answer
      dir.listFiles().filter(_.getName.endsWith(".gdf"))
        .foreach(f => java.nio.file.Files.write(f.toPath, Array.emptyByteArray))
      val t = spark.read.format("graftdocs").load(dir.getAbsolutePath)
      // doc_id >= 20 lands ON the file boundary: file 1 fully pruned,
      // file 2 fully inside -> the filter is CONSUMED and the aggregate
      // pushes; the fold over the surviving file is the filtered answer
      val q = t.where(col("doc_id") >= 20L)
        .agg(count(lit(1)).as("n"), min(col("score")).as("mn"),
          max(col("score")).as("mx"), sum(col("score")).as("s"))
      assert(!hasAgg(q),
        s"file-aligned filtered aggregate was not pushed:\n" +
          s"${q.queryExecution.optimizedPlan}")
      val desc = v2scan(q).description()
      assert(desc.contains("PushedAggregation") &&
        desc.contains("PushedFilters") && desc.contains("1/2 files"),
        s"description missing the filtered pushdown evidence: $desc")
      val r = q.collect()(0)
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
        ((20L, 60L, 117L, (20L until 40L).map(_ * 3).sum)),
        "filtered metadata fold diverged from ground truth")
      // a MISALIGNED bound (cuts inside file 2) must refuse: the filter
      // stays residual and the aggregation keeps the real (row) path
      val mis = t.where(col("doc_id") >= 25L).agg(count(lit(1)).as("n"))
      assert(hasAgg(mis), "misaligned filtered aggregate must not push")
      // a filter that prunes EVERYTHING still answers exactly: count 0,
      // null min — one global row, zero groups in the grouped form
      val empty = t.where(col("doc_id") >= 1000L)
        .agg(count(lit(1)).as("n"), min(col("score")).as("mn"))
      assert(!hasAgg(empty), "all-pruned filtered aggregate should push")
      val er = empty.collect()(0)
      assert(er.getLong(0) == 0L && er.isNullAt(1))
      val emptyGrouped = t.where(col("doc_id") >= 1000L)
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      assert(!hasAgg(emptyGrouped) && emptyGrouped.collect().isEmpty)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
