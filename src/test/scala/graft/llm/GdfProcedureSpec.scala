package org.apache.spark.sql.graft.dsv2

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the SQL STORED PROCEDURES (r18): Spark 4's ProcedureCatalog
  * surface driving the existing maintenance verbs via plain `CALL`,
  * with their summaries as result sets. */
class GdfProcedureSpec extends SparkSpec {
  import spark.implicits._

  private val root = s"/tmp/graft-proc-spec-${System.nanoTime()}"
  private val cat = "graftprocspec"

  private lazy val registered: Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  private var n = 0
  private def fragmentedTable(): String = {
    registered; n += 1
    val t = s"t$n"
    val base = (0L until 40L).map(i => (i, 10L * i)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
    Seq(col("doc_id") < 20L, col("doc_id") >= 20L).zipWithIndex.foreach {
      case (slice, i) =>
        base.where(slice).write.format("graftdocs").option("buckets", "4")
          .mode(if (i == 0) "overwrite" else "append").save(s"$root/$t")
    }
    t
  }

  test("CALL compact runs OPTIMIZE and reports the file collapse") {
    val t = fragmentedTable()
    val got = spark.sql(s"CALL $cat.compact('$t')")
      .as[(Long, Long)].head()
    assert(got == ((8L, 4L)), s"8 fragmented files -> 4, got $got")
    assert(GdfManifest.read(s"$root/$t").files.size == 4)
    assert(spark.read.format("graftdocs").load(s"$root/$t").count() == 40L)
  }

  test("CALL remove_orphans sweeps aged unreferenced files, returns names") {
    val t = fragmentedTable()
    val dir = s"$root/$t"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType)))
    GdfFormat.writeFile(dir, "part-0-orphan.gdf", schema, 0,
      Seq(Array[Any](99L, 0)))
    new File(dir, "part-0-orphan.gdf")
      .setLastModified(System.currentTimeMillis() - 100000L)
    val got = spark.sql(s"CALL $cat.remove_orphans('$t', 50000)")
      .as[String].collect().toSeq
    assert(got == Seq("part-0-orphan.gdf"), s"got $got")
    assert(!new File(dir, "part-0-orphan.gdf").exists())
    assert(spark.read.format("graftdocs").load(dir).count() == 40L)
  }

  test("an unknown procedure fails loudly") {
    registered
    val e = intercept[Exception](spark.sql(s"CALL $cat.vacuum('x')").collect())
    assert(e.getMessage.contains("vacuum"),
      s"unknown procedure must fail loudly, got: ${e.getMessage}")
  }

  test("CALL publish cherry-picks a staged append onto main") {
    val t = fragmentedTable()
    val dir = s"$root/$t"
    Seq((100L, 1L)).toDF("doc_id", "val")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .option("staged", "true").mode("append").save(dir)
    val stagedV = GdfMaintenance.stagedVersions(dir).last
    assert(spark.read.format("graftdocs").load(dir).count() == 40L)
    val published = spark.sql(s"CALL $cat.publish('$t', $stagedV)")
      .as[Int].head()
    assert(published > stagedV)
    assert(spark.read.format("graftdocs").load(dir).count() == 41L)
  }

  test("CALL add_column + add_constraint + drop_constraint round-trip") {
    val t = fragmentedTable()
    val dir = s"$root/$t"
    spark.sql(s"CALL $cat.add_column('$t', 'quality', 'long', '7')").collect()
    assert(spark.read.format("graftdocs").load(dir)
      .where(col("doc_id") === 3L).select("quality").head().getLong(0) == 7L)
    spark.sql(s"CALL $cat.add_constraint('$t', 'q_pos', 'quality > 0')")
      .collect()
    intercept[Exception] {
      Seq((200L, 1L, -4L)).toDF("doc_id", "val", "quality")
        .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
        .write.format("graftdocs").option("buckets", "4")
        .mode("append").save(dir)
    }
    spark.sql(s"CALL $cat.drop_constraint('$t', 'q_pos')").collect()
    Seq((200L, 1L, -4L)).toDF("doc_id", "val", "quality")
      .withColumn("bucket", pmod(col("doc_id"), lit(4L)).cast("int"))
      .write.format("graftdocs").option("buckets", "4")
      .mode("append").save(dir)
    assert(spark.read.format("graftdocs").load(dir).count() == 41L)
  }

  test("CALL ndv answers from the manifest sketches") {
    val t = fragmentedTable()
    val got = spark.sql(s"CALL $cat.ndv('$t', 'doc_id')")
      .select("ndv_estimate").as[Long].head()
    assert(got == 40L, s"40 distinct ids, below k: must be exact, got $got")
  }
}
