package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Dumps are single-file (coalesce(1)) because the hash compare is
  * row-order-sensitive and every query declares a total ORDER BY — a
  * multi-file dump would lose global order at read time. All verify-dump
  * results are small (≤60k rows at sf0.01) so the single final task is cheap;
  * the upstream plan still runs at full parallelism (coalesce(1) after the
  * global sort only merges sorted partitions). Per-query success/failure is
  * recorded in verify_status.json so a failed dump can't be mistaken for a
  * skipped one.
  */
object Verify {

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // local-iteration filter (comma-separated names); the driver sets no
    // env → full dump. oracle_sql.json is always written in full. Excluded
    // queries get an explicit "skipped" status (their dump dirs, if any,
    // are from an earlier run) so a later DuckDB compare over the same
    // outDir can't mistake a stale dump for a current result.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val status = SparkEntry.queries.toSeq.sortBy(_._1)
      .map { case (name, fn) =>
      if (!only.forall(_.contains(name))) name -> "skipped"
      else try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        name -> "ok"
      } catch {
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          name -> s"fail: ${e.getClass.getSimpleName}"
      }
    }

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val statusJson = status.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_status.json"), statusJson)
    spark.stop()
  }
}
