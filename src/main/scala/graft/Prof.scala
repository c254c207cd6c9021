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

    def bench(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[prof] $name run$i exec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }

    // named-entry mode: profile specific registered entries
    if (args.nonEmpty) {
      if (args.head == "minhash_parts") {
        import graft.llm.{Dedup, Text}
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .repartition(spark.sparkContext.defaultParallelism)
        bench("shingle_sets")(
          docs.select(col("doc_id"), Text.shingles(col("text"), 3).as("sset")))
        bench("base_hashes")(
          docs.select(col("doc_id"), Text.shingles(col("text"), 3).as("sset"))
            .withColumn("hrs", transform(col("sset"),
              x => pmod(Text.hash64(x), lit(Dedup.BaseHashMod)))))
        bench("signatures")(
          docs.select(col("doc_id"), Text.shingles(col("text"), 3).as("sset"))
            .withColumn("hrs", transform(col("sset"),
              x => pmod(Text.hash64(x), lit(Dedup.BaseHashMod))))
            .select(col("doc_id") +: (0 until 64).map { i =>
              val (a, b) = Dedup.minhashSeeds(i)
              array_min(transform(col("hrs"),
                hr => pmod(lit(a) * hr + lit(b), lit(Dedup.MinhashP)))).as(s"m$i")
            }: _*))
        val sig = docs.select(col("doc_id"), Text.shingles(col("text"), 3).as("sset"))
          .withColumn("hrs", transform(col("sset"),
            x => pmod(Text.hash64(x), lit(Dedup.BaseHashMod))))
          .select(col("doc_id") +: (0 until 64).map { i =>
            val (a, b) = Dedup.minhashSeeds(i)
            array_min(transform(col("hrs"),
              hr => pmod(lit(a) * hr + lit(b), lit(Dedup.MinhashP)))).as(s"m$i")
          }: _*)
        val bandKeys = (0 until 16).map { bnd =>
          concat_ws(",", (0 until 4).map(r => col(s"m${bnd * 4 + r}").cast("string")): _*)
        }
        val bands = sig.select(col("doc_id"),
          posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
        bench("bands")(bands)
        val cand = bands.as("a")
          .join(bands.as("b").hint("shuffle_hash"),
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        bench("cand")(cand)
      } else args.foreach(n => bench(n)(SparkEntry.queries(n)(spark, sfDir)))
      spark.stop()
      return
    }

    val t = Warehouse.tables(spark, sfDir)
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
