package graft

import org.apache.spark.sql.SparkSession

import graft.warehouse.Warehouse

/** Ad-hoc profiling main (not part of the driver contract): splits per-query
  * wall time into plan-construction vs execution to direct bench tuning. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROF_AQE", "true"))
      .config("spark.shuffle.compress", sys.env.getOrElse("PROF_SHUFFLE_COMPRESS", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val t = Warehouse.tables(spark, sfDir)

    def bench(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[prof] $name run$i exec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }

    bench("scan_only")(t.fact.select(col("quantity")))
    bench("scan_agg")(t.fact.groupBy(col("customer_id")).agg(sum(col("quantity"))))
    bench("scan_join_agg")(
      t.fact.join(broadcast(t.customer), "customer_id")
        .groupBy(col("gender"), col("age"), col("city_category"))
        .agg(sum(col("purchase_amount"))))
    bench("full_q02")(
      t.fact.join(broadcast(t.customer), "customer_id")
        .groupBy(col("gender"), col("age"), col("city_category"))
        .agg(sum(col("purchase_amount")).as("s"))
        .orderBy(col("gender"), col("age"), col("city_category")))
    spark.stop()
  }
}
