package graft

/** Guards the driver contract: every registered query must carry a DuckDB
  * oracle (the correctness gate hashes against it — an entry silently
  * missing its oracle would downgrade to a rows-only check), names must be
  * unique across the sub-registries, and the flagship entry must produce
  * rows on the smoke scale factor. */
class RegistrySpec extends SparkSpec {

  test("every query has an oracle (no silent rows-only downgrades)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("registry names are unique across sub-registries") {
    val all = Seq(
      queries.RefQueries.all, queries.RefQueries.starTables,
      queries.SqlQueries.all, queries.ExtraQueries.all,
      queries.AnalyticsQueries.all, llm.LlmQueries.all,
      llm.CorpusQueries.all, etl.EtlQueries.all).flatten.map(_.name)
    val dups = all.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate entry names: $dups")
    assert(all.size == SparkEntry.queries.size)
  }

  test("flagship entry returns rows at the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
