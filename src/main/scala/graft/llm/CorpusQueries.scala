package graft.llm

import graft.queries.QueryDef

/** Driver-verifiable entries for the [[Corpus]] operators (token chunking,
  * stratified sampling, int8 quantization, BM25 retrieval). Each oracle is
  * the lockstep DuckDB twin of the Spark plan: the same tokenization
  * (string split on ' '), the same 60-bit md5-prefix hash, the same
  * fold/round discipline as the rest of the LLM suite (see [[LlmQueries]]).
  */
object CorpusQueries {

  /** DuckDB twin of [[Text.hash64]]. */
  private def hash64Sql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** Shared oracle of [[Corpus.snapshotDiff]] AND the streamed CDC twin
    * ([[graft.streaming.SnapshotDiffStream]]) — both engines derive both
    * snapshot versions from the one driver table (prev lacks the
    * doc_id%7=3 rows and mutates doc_id%5=0 texts; cur lacks
    * doc_id%11=5), so the hash match certifies the diff classification
    * itself; digests, never texts, cross the join. */
  private val snapshotDiffSql = s"""
        WITH prev AS (SELECT doc_id,
                             md5(CASE WHEN doc_id % ${Corpus.DiffChangedMod} = 0
                                 THEN 'v0 ' || text ELSE text END) AS h_prev
                      FROM documents
                      WHERE doc_id % ${Corpus.DiffAddedMod} <> ${Corpus.DiffAddedRes}),
        cur AS (SELECT doc_id, md5(text) AS h_cur FROM documents
                WHERE doc_id % ${Corpus.DiffRemovedMod} <> ${Corpus.DiffRemovedRes})
        SELECT doc_id,
               CASE WHEN h_prev IS NULL THEN 'added'
                    WHEN h_cur IS NULL THEN 'removed'
                    WHEN h_prev <> h_cur THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM prev FULL JOIN cur USING (doc_id)
        ORDER BY doc_id"""

  /** Shared oracle of [[Corpus.decontaminate]] AND
    * [[Corpus.decontaminateBloom]] (the bloom path is output-identical by
    * construction — prefilter + exact confirm): each non-benchmark doc's
    * distinct-shingle count against the union of benchmark-doc shingles
    * (benchmark = doc_id ≡ 0 mod BenchmarkMod). The shingle CTE is the
    * lockstep twin of Text.shingles (see LlmQueries.ShinglesCte); docs
    * shorter than 3 tokens have no shingles and are out of scope. */
  private val decontaminateSql = s"""
        WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS (SELECT doc_id,
                      unnest(list_distinct(list_transform(
                        generate_series(1, len(t) - 2),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
               FROM tk WHERE len(t) >= 3),
        bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % ${Corpus.BenchmarkMod} = 0),
        corpus AS (SELECT doc_id, count(*) AS n_grams FROM sh
                   WHERE doc_id % ${Corpus.BenchmarkMod} <> 0 GROUP BY doc_id),
        hits AS (SELECT s.doc_id, count(*) AS hits
                 FROM sh s JOIN bench USING (sh)
                 WHERE s.doc_id % ${Corpus.BenchmarkMod} <> 0 GROUP BY s.doc_id)
        SELECT c.doc_id, c.n_grams,
               COALESCE(h.hits, 0) AS n_contaminated_grams,
               COALESCE(h.hits, 0) > 0 AS contaminated
        FROM corpus c LEFT JOIN hits h USING (doc_id)
        ORDER BY doc_id"""

  /** Shared DoReMi CTE chain (Xie et al. 2023) — the per-source surprisal
    * loss proxy (`tok`→`loss`), the uniform init `a0`, and
    * [[Corpus.DoremiRounds]] Group-DRO multiplicative-weight rounds
    * unrolled as MATERIALIZED CTEs (the kmeans/PageRank discipline).
    * Interpolated VERBATIM by BOTH `corpus_domain_reweight` (the
    * trajectory dump) and `corpus_reweighted_sample` (the mixture
    * materialization) so the two oracles can never drift: one definition,
    * two consumers. Ends on the last `a$${rounds}` CTE with NO trailing
    * comma — callers append `, extra AS (…)` or the final SELECT
    * themselves. Every host literal CAST AS DOUBLE; exp() 9-dp-rounded
    * exactly like the suite's ln(). */
  private val doremiCtes: String = {
    val eta = Corpus.DoremiEta
    val oneMinusC = 1.0 - Corpus.DoremiSmooth
    val c = Corpus.DoremiSmooth
    val rounds = (1 to Corpus.DoremiRounds).map { t =>
      val prev = if (t == 1) "a0" else s"a${t - 1}"
      s""",
        m$t AS (SELECT CAST(sum(CAST(round(alpha * loss, 9)
                                     AS DECIMAL(28,9))) AS DOUBLE) AS lam
                FROM $prev),
        e$t AS (SELECT source, loss, alpha,
                       round(greatest(loss - lam, CAST(0 AS DOUBLE)), 9)
                         AS excess
                FROM $prev, m$t),
        u$t AS (SELECT source, loss, excess,
                       round(alpha * round(exp(CAST($eta AS DOUBLE) * excess),
                                           9), 9) AS u
                FROM e$t),
        s$t AS (SELECT CAST(sum(CAST(u AS DECIMAL(28,9))) AS DOUBLE) AS s
                FROM u$t),
        a$t AS MATERIALIZED (SELECT source, loss, excess,
                       round(CAST($oneMinusC AS DOUBLE) * round(u / s, 9) +
                             CAST($c AS DOUBLE) / kk, 9) AS alpha
                FROM u$t, s$t, k)"""
    }.mkString
    s"""tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
                     FROM documents),
        tf AS (SELECT source, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfr AS (SELECT token, sum(tf) AS term_freq FROM tf GROUP BY 1),
        tot AS (SELECT CAST(sum(term_freq) AS DOUBLE) AS total_tokens
                FROM dfr),
        sc AS (SELECT source, tf,
                      CAST(round(tf * -ln(CAST(term_freq AS DOUBLE) /
                                          total_tokens), 9)
                        AS DECIMAL(28, 9)) AS c
               FROM tf JOIN dfr USING (token) CROSS JOIN tot),
        loss AS (SELECT source,
                        round(CAST(sum(c) AS DOUBLE) / sum(tf), 6) AS loss
                 FROM sc GROUP BY source),
        k AS (SELECT count(*) AS kk FROM loss),
        a0 AS (SELECT source, loss,
                      round(CAST(1 AS DOUBLE) / kk, 9) AS alpha
               FROM loss, k)
        $rounds"""
  }

  val all: Seq[QueryDef] = Seq(

    // Overlapping token chunks. chunk_idx is derivable from chunk_start
    // ((start-1)/stride) so the oracle needs no unnest-with-ordinality;
    // DuckDB's list slice t[a:b] is inclusive-both-ends 1-based = Spark's
    // slice(t, a, 50) → t[a : a+49].
    QueryDef("corpus_chunks",
      (s, dir) => Corpus.chunks(s, dir),
      Some(s"""
        WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        st AS (SELECT doc_id, t,
                      unnest(generate_series(1, len(t), ${Corpus.ChunkStride})) AS chunk_start
               FROM tk WHERE len(t) >= 1)
        SELECT doc_id,
               CAST((chunk_start - 1) // ${Corpus.ChunkStride} AS BIGINT) AS chunk_idx,
               chunk_start,
               least(${Corpus.ChunkSize}, len(t) - chunk_start + 1) AS chunk_tokens,
               md5(array_to_string(t[chunk_start : chunk_start + ${Corpus.ChunkSize - 1}], ' ')) AS chunk_md5
        FROM st ORDER BY doc_id, chunk_idx""")),

    // Deterministic stratified sampling: salted hash64 of the doc id mod
    // 1000 vs per-language keep rates. Both buckets are 60-bit positive →
    // pmod and % agree.
    QueryDef("corpus_stratified_sample",
      (s, dir) => Corpus.stratifiedSample(s, dir),
      Some(s"""
        WITH b AS (SELECT doc_id, lang,
                          ${hash64Sql("concat('smp|', CAST(doc_id AS VARCHAR))")} % 1000 AS bucket
                   FROM documents)
        SELECT doc_id, lang, bucket FROM b
        WHERE bucket < CASE lang ${Corpus.SampleRates
          .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")}
                                 ELSE ${Corpus.SampleDefaultRate} END
        ORDER BY doc_id""")),

    // Sequence packing (concat-and-chunk). The oracle computes the global
    // token offsets with a plain total-order running sum — fine on a
    // single-node engine; the Spark side's two-phase bucketed prefix sum
    // produces the identical integer offsets without a single-partition
    // window (see Corpus.pack's scale notes).
    QueryDef("corpus_pack",
      (s, dir) => Corpus.pack(s, dir),
      Some(s"""
        WITH tk AS (SELECT doc_id,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents),
        c AS (SELECT doc_id, n_tokens,
                     CAST(sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       - n_tokens AS doc_start
              FROM tk WHERE n_tokens >= 1)
        SELECT doc_id, n_tokens,
               doc_start // ${Corpus.PackBudget} AS pack_first,
               (doc_start + n_tokens - 1) // ${Corpus.PackBudget} AS pack_last,
               doc_start % ${Corpus.PackBudget} AS offset_in_pack
        FROM c ORDER BY doc_id""")),

    // Int8 absmax quantization audit scalars. scale is the UNROUNDED
    // 127/max|v| in both engines; |q| values are whole numbers ≤ 127 so
    // sum_abs_q is exactly representable (order-independent); err_rms
    // rounds to 6 dp (way above fold-order ulp noise).
    QueryDef("corpus_quantize_int8",
      (s, dir) => Corpus.quantizeInt8(s, dir),
      Some("""
        WITH e AS (SELECT vec_id, embedding AS v,
                          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs
                   FROM embeddings),
        q AS (SELECT vec_id, v, max_abs, 127.0 / max_abs AS scale,
                     list_transform(v, x -> round(CAST(x AS DOUBLE) * (127.0 / max_abs))) AS qv
              FROM e WHERE max_abs > 0)
        SELECT vec_id, round(max_abs, 6) AS max_abs,
               CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS sum_abs_q,
               round(sqrt(list_sum(list_transform(generate_series(1, len(v)),
                 i -> (CAST(v[i] AS DOUBLE) - qv[i] / scale) * (CAST(v[i] AS DOUBLE) - qv[i] / scale)))
                 / len(v)), 6) AS err_rms
        FROM q ORDER BY vec_id""")),

    // Benchmark decontamination (exact-broadcast form; see
    // decontaminateSql for the shared semantics).
    QueryDef("corpus_decontaminate",
      (s, dir) => Corpus.decontaminate(s, dir),
      Some(decontaminateSql)),

    // Bloom-prefiltered decontamination: the Spark side probes a
    // distributed-built Bloom filter before the exact confirm join, so
    // the composition stays EXACT (no false negatives + exact verify of
    // survivors) — the oracle is corpus_decontaminate's, verbatim. The
    // hash match certifies that the sketch path changes the plan shape,
    // not one output bit.
    QueryDef("corpus_decontaminate_bloom",
      (s, dir) => Corpus.decontaminateBloom(s, dir),
      Some(decontaminateSql)),

    // STREAMED decontamination (r15): the benchmark gram set + Bloom
    // prefilter build OFFLINE, arriving docs screened ONLINE (per-row
    // shingling, bloom-guarded exact-confirm broadcast join, one
    // doc-keyed fold) — shares the batch oracle VERBATIM, so the hash
    // match certifies offline-build == online-screen under any
    // micro-batch split.
    QueryDef("corpus_decontaminate_streamed",
      (s, dir) => graft.streaming.DecontaminateStream
        .decontaminateStreamed(s, dir),
      Some(decontaminateSql)),

    // DoReMi-style iterative domain reweighting (r15, Xie et al. 2023):
    // Group-DRO multiplicative weights over the per-source surprisal
    // loss proxy, DoremiRounds rounds UNROLLED as MATERIALIZED CTEs (the
    // kmeans/PageRank discipline) — the hash match certifies the entire
    // round-by-round weight trajectory. Every host literal CAST AS
    // DOUBLE; exp() 9-dp-rounded exactly like the suite's ln().
    QueryDef("corpus_domain_reweight",
      (s, dir) => Corpus.domainReweight(s, dir),
      Some {
        val sel = (1 to Corpus.DoremiRounds).map(t =>
          s"SELECT $t AS round, source, loss, excess, alpha FROM a$t")
          .mkString("\n        UNION ALL ")
        s"""
        WITH $doremiCtes
        $sel ORDER BY round, source"""
      }),

    // REWEIGHTED RESAMPLING (r15): materialize the DoReMi mixture — the
    // final-round alphas drive downsample-only per-source rates
    // (boost = alpha/share normalized to the most-boosted source, the
    // temperature-mix discipline) and the shared deterministic keep-hash
    // gate picks survivors. The oracle composes the FULL reweighting CTE
    // chain verbatim (one definition, no drift) with the share/rate
    // arithmetic and the same hash gate.
    QueryDef("corpus_reweighted_sample",
      (s, dir) => Corpus.domainReweightSample(s, dir),
      Some {
        val r = Corpus.DoremiRounds
        s"""
        WITH $doremiCtes,
        pd AS (SELECT doc_id, source,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
               FROM documents),
        st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(n_tokens) AS BIGINT) AS src_tokens
               FROM pd GROUP BY source),
        tt AS (SELECT CAST(sum(src_tokens) AS DOUBLE) AS t FROM st),
        shr AS (SELECT source, n_docs, src_tokens,
                       round(CAST(src_tokens AS DOUBLE) / t, 6) AS share
                FROM st, tt),
        b AS (SELECT s.source, s.n_docs, s.src_tokens, s.share, a.alpha,
                     round(a.alpha / s.share, 6) AS boost
              FROM shr s JOIN a$r a USING (source)),
        mx AS (SELECT max(boost) AS mb FROM b),
        rt AS (SELECT source, n_docs, src_tokens, share, alpha,
                      round(boost / mb, 6) AS sample_rate
               FROM b, mx),
        kept AS (SELECT p.source,
                        CAST(sum(CASE WHEN ${hash64Sql(
                          "concat('drw|', CAST(p.doc_id AS VARCHAR))")}
                            % ${Corpus.TempKeepMod} <
                            r.sample_rate * ${Corpus.TempKeepMod}
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                        CAST(sum(CASE WHEN ${hash64Sql(
                          "concat('drw|', CAST(p.doc_id AS VARCHAR))")}
                            % ${Corpus.TempKeepMod} <
                            r.sample_rate * ${Corpus.TempKeepMod}
                          THEN p.n_tokens ELSE 0 END) AS BIGINT)
                          AS kept_tokens
                 FROM pd p JOIN rt r USING (source)
                 GROUP BY p.source)
        SELECT r.source, r.n_docs, r.src_tokens, r.share, r.alpha,
               r.sample_rate, k.n_kept, k.kept_tokens
        FROM rt r JOIN kept k USING (source)
        ORDER BY r.source"""
      }),

    // TOKEN-BUDGET EPOCH ALLOCATION (r16, Muennighoff et al. 2023): the
    // planning step that turns the DoReMi mixture into a training
    // recipe under data constraints — per source, epochs =
    // min(EpochCap, B·alpha/tokens) with the capped shortfall reported
    // honestly. Third consumer of the shared doremiCtes chain (one
    // definition, zero drift).
    QueryDef("corpus_epoch_allocation",
      (s, dir) => Corpus.epochAllocation(s, dir),
      Some {
        val r = Corpus.DoremiRounds
        s"""
        WITH $doremiCtes,
        pd AS (SELECT source,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
               FROM documents),
        st AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
               FROM pd GROUP BY source),
        tt AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens
               FROM st),
        pl AS (SELECT s.source, s.src_tokens, t.total_tokens, a.alpha,
                      round(CAST(${Corpus.EpochBudgetX} AS DOUBLE)
                            * CAST(t.total_tokens AS DOUBLE) * a.alpha, 6)
                        AS target_tokens
               FROM st s JOIN a$r a USING (source) CROSS JOIN tt t),
        ep AS (SELECT *,
                      round(target_tokens / CAST(src_tokens AS DOUBLE), 6)
                        AS epochs_raw
               FROM pl),
        fin AS (SELECT *,
                       least(CAST(${Corpus.EpochCap} AS DOUBLE), epochs_raw)
                         AS epochs,
                       epochs_raw > CAST(${Corpus.EpochCap} AS DOUBLE)
                         AS capped
                FROM ep)
        SELECT source, src_tokens, total_tokens, alpha, target_tokens,
               epochs_raw, epochs, capped,
               round(epochs * CAST(src_tokens AS DOUBLE), 6)
                 AS allocated_tokens,
               round(target_tokens -
                     round(epochs * CAST(src_tokens AS DOUBLE), 6), 6)
                 AS shortfall_tokens
        FROM fin ORDER BY source"""
      }),

    // Benchmark-CONTAMINATION REPORT (r15): the per-eval-set overlap
    // rates a release publishes (GPT-3 Appendix C) next to the drop
    // pass. Eval sets = benchmark docs grouped by source; cells =
    // (eval_source, corpus_source) with distinct shared shingles, docs
    // hit, eval totals, and the 6-dp overlap rate of exact longs.
    QueryDef("corpus_contamination_report",
      (s, dir) => Corpus.contaminationReport(s, dir),
      Some(s"""
        WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t
                    FROM documents),
        sh AS (SELECT doc_id, source,
                      unnest(list_distinct(list_transform(
                        generate_series(1, len(t) - 2),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
               FROM tk WHERE len(t) >= 3),
        bench AS (SELECT DISTINCT source AS eval_source, sh FROM sh
                  WHERE doc_id % ${Corpus.BenchmarkMod} = 0),
        et AS (SELECT eval_source, count(*) AS n_eval_grams FROM bench
               GROUP BY eval_source),
        j AS (SELECT b.eval_source, s.source AS corpus_source,
                     s.doc_id, s.sh
              FROM sh s JOIN bench b USING (sh)
              WHERE s.doc_id % ${Corpus.BenchmarkMod} <> 0),
        ag AS (SELECT eval_source, corpus_source,
                      count(DISTINCT sh) AS n_shared_grams,
                      count(DISTINCT doc_id) AS n_docs_hit
               FROM j GROUP BY eval_source, corpus_source)
        SELECT a.eval_source, a.corpus_source, e.n_eval_grams,
               a.n_shared_grams, a.n_docs_hit,
               round(CAST(a.n_shared_grams AS DOUBLE) /
                     CAST(e.n_eval_grams AS DOUBLE), 6) AS gram_overlap
        FROM ag a JOIN et e USING (eval_source)
        ORDER BY eval_source, corpus_source""")),

    // BM25 top-20. The scoring expression mirrors the Spark column tree
    // token for token (same literals, same left-assoc order, ln rounded to
    // 9 dp before the DECIMAL(28,9) sum, final score rounded to 6 dp).
    QueryDef("corpus_bm25_topk",
      (s, dir) => Corpus.bm25TopK(s, dir),
      Some(s"""
        WITH $bm25Ctes
        SELECT doc_id, score, n_matched_terms,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM agg ORDER BY score DESC, doc_id LIMIT ${Corpus.Bm25TopK}""")),

    // Line-level boilerplate removal: t[st : st+7] is DuckDB's 1-based
    // inclusive slice = Spark's slice(t, st, 8); the kept-line digest is
    // string_agg over md5s in line order (empty-group NULL → md5('') to
    // match Spark's concat_ws over an empty array).
    QueryDef("corpus_line_dedup",
      (s, dir) => Corpus.lineDedup(s, dir),
      Some(s"""
        WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        st AS (SELECT doc_id, t,
                      unnest(generate_series(1, len(t), ${Corpus.LineTokens})) AS st
               FROM tk WHERE len(t) >= 1),
        li AS (SELECT doc_id, (st - 1) // ${Corpus.LineTokens} AS line_idx,
                      md5(array_to_string(t[st : st + ${Corpus.LineTokens - 1}], ' ')) AS lmd5
               FROM st),
        cnt AS (SELECT lmd5, count(*) AS c FROM li GROUP BY 1),
        fl AS (SELECT doc_id, line_idx, lmd5,
                      c < ${Corpus.LineDupThreshold} AS kept
               FROM li JOIN cnt USING (lmd5))
        SELECT doc_id, count(*) AS n_lines,
               count(*) FILTER (WHERE kept) AS n_kept,
               md5(coalesce(string_agg(lmd5, '|' ORDER BY line_idx)
                              FILTER (WHERE kept), '')) AS clean_md5
        FROM fl GROUP BY doc_id ORDER BY doc_id""")),

    // Substring-level exact dedup (ExactSubstr). The oracle runs the same
    // windowed construction: per-position fixed-width keys, count-over-key
    // duplicate marking, gaps-and-islands span merge (q <= p+W merges),
    // inter-span gaps + tail reassembled as the cleaned text. lag(pos)=null
    // → `pos - null <= W` is null → the ELSE 1 branch opens an island in
    // both dialects identically.
    QueryDef("corpus_substr_dedup",
      (s, dir) => Corpus.substrDedup(s, dir),
      Some {
        val w = Corpus.SubstrWidth
        s"""
        WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
        k AS (SELECT doc_id, text, len,
                     unnest(generate_series(1, len - ${w - 1})) AS pos
              FROM d WHERE len >= $w),
        ky AS (SELECT doc_id, pos, md5(substr(text, pos, $w)) AS key FROM k),
        dup AS (SELECT doc_id, pos FROM (
                  SELECT doc_id, pos, count(*) OVER (PARTITION BY key) AS c
                  FROM ky) WHERE c > 1),
        brk AS (SELECT doc_id, pos,
                       CASE WHEN pos - lag(pos) OVER w <= $w THEN 0
                            ELSE 1 END AS brk
                FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        isl AS (SELECT doc_id, pos,
                       sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
                FROM brk),
        sp AS (SELECT doc_id, isl, min(pos) AS s, max(pos) + ${w - 1} AS e,
                      count(*) AS npos
               FROM isl GROUP BY 1, 2),
        g AS (SELECT doc_id,
                     coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0)
                       + 1 AS gs,
                     s - 1 AS ge
              FROM sp
              UNION ALL
              SELECT doc_id, max(e) + 1 AS gs, NULL AS ge
              FROM sp GROUP BY doc_id),
        seg AS (SELECT g.doc_id, gs,
                       substr(d.text, gs, coalesce(ge, d.len) - gs + 1) AS seg
                FROM g JOIN d USING (doc_id)
                WHERE coalesce(ge, d.len) >= gs),
        cl AS (SELECT doc_id, string_agg(seg, '' ORDER BY gs) AS clean
               FROM seg GROUP BY doc_id),
        st AS (SELECT doc_id, count(*) AS n_spans,
                      CAST(sum(e - s + 1) AS BIGINT) AS dup_chars,
                      CAST(sum(npos) AS BIGINT) AS n_dup_pos
               FROM sp GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(st.n_dup_pos, 0) AS n_dup_pos,
               coalesce(st.n_spans, 0) AS n_spans,
               coalesce(st.dup_chars, 0) AS dup_chars,
               md5(CASE WHEN st.doc_id IS NULL THEN d.text
                        ELSE coalesce(cl.clean, '') END) AS clean_md5
        FROM d LEFT JOIN st USING (doc_id) LEFT JOIN cl USING (doc_id)
        ORDER BY d.doc_id"""
      }),

    // The composed curation pipeline: the oracle chains the same stages as
    // CTEs, with pack's offsets from a plain running sum over survivors.
    QueryDef("corpus_curation_pipeline",
      (s, dir) => Corpus.curationPipeline(s, dir),
      Some(s"""
        WITH nrm AS (SELECT doc_id,
                            trim(regexp_replace(regexp_replace(lower(text),
                              '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS ntext
                     FROM documents),
        tk AS (SELECT doc_id, ntext, string_split(ntext, ' ') AS t FROM nrm),
        qual AS (SELECT doc_id, ntext, len(t) AS n_tokens FROM tk
                 WHERE len(t) >= ${Corpus.CurationMinTokens}
                   AND CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
                         >= ${Corpus.CurationMinUniqRatio}),
        ded AS (SELECT *, row_number() OVER (PARTITION BY md5(ntext)
                          ORDER BY doc_id) AS rn FROM qual),
        srv AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
                FROM ded WHERE rn = 1),
        p AS (SELECT doc_id, n_tokens,
                     CAST(sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS doc_start
              FROM srv)
        SELECT doc_id, n_tokens,
               doc_start // ${Corpus.PackBudget} AS pack_first,
               (doc_start + n_tokens - 1) // ${Corpus.PackBudget} AS pack_last,
               doc_start % ${Corpus.PackBudget} AS offset_in_pack
        FROM p ORDER BY doc_id""")),

    // Corpus VERSION DIFF (r14, X72): the dataset-versioning compare —
    // two snapshots derived deterministically from the one driver table
    // (prev lacks the doc_id%7=3 rows and mutates doc_id%5=0 texts; cur
    // lacks doc_id%11=5), full-outer-joined on doc_id over content
    // digests, one status row per doc. The hash match certifies the diff
    // classification itself; digests, never texts, cross the join.
    QueryDef("corpus_snapshot_diff",
      (s, dir) => Corpus.snapshotDiff(s, dir),
      Some(snapshotDiffSql)),

    // The STREAMED (CDC) form of the same diff (r14, X76): rows fan out
    // into derived prev/cur digest rows as they arrive; one doc_id-keyed
    // aggregation holds (h_prev, h_cur) state; the status CASE reads the
    // drained state. The fold is exact and order-insensitive, so the
    // entry shares the batch oracle VERBATIM — the hash match certifies
    // stream == batch under any micro-batch split.
    QueryDef("corpus_snapshot_diff_streamed",
      (s, dir) => graft.streaming.SnapshotDiffStream.snapshotDiffStreamed(s, dir),
      Some(snapshotDiffSql)),

    // DSIR importance resampling (Xie et al. 2023): hashed unigram+bigram
    // bucket models (shared hash64), add-one smoothing over the bucket
    // space, 9-dp ln weights + DECIMAL occurrence sums, deterministic
    // hash-seeded Gumbel keys, ONE 4-dp percentile cut — the oracle
    // retrains both models from scratch so the hash match certifies the
    // whole select pipeline.
    QueryDef("corpus_dsir_select",
      (s, dir) => Corpus.dsirSelect(s, dir),
      Some {
        val srcs = graft.llm.TextAnalysis.NbTargetSources
          .map(s => s"'$s'").mkString(", ")
        val b = Corpus.DsirBuckets
        s"""
        WITH tk AS (SELECT doc_id, source IN ($srcs) AS is_target,
                           string_split(text, ' ') AS t FROM documents),
        gr AS (SELECT doc_id, is_target, unnest(t) AS gram FROM tk
               UNION ALL
               SELECT doc_id, is_target,
                      unnest(list_transform(generate_series(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1])) AS gram
               FROM tk WHERE len(t) >= 2),
        fb AS (SELECT doc_id, is_target, ${hash64Sql("gram")} % $b AS b
               FROM gr),
        ct AS (SELECT b, sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct_t,
                      sum(CASE WHEN NOT is_target THEN 1 ELSE 0 END) AS ct_r
               FROM fb GROUP BY 1),
        tot AS (SELECT sum(ct_t) AS tot_t, sum(ct_r) AS tot_r FROM ct),
        w AS (SELECT b,
                     round(ln(CAST(ct_t + 1 AS DOUBLE) / CAST(tot_t + $b AS DOUBLE))
                         - ln(CAST(ct_r + 1 AS DOUBLE) / CAST(tot_r + $b AS DOUBLE)),
                       9) AS w
              FROM ct CROSS JOIN tot),
        sc AS (SELECT doc_id, count(*) AS n_grams,
                      round(CAST(sum(CAST(w AS DECIMAL(28, 9))) AS DOUBLE), 6)
                        AS logw
               FROM fb JOIN w USING (b) WHERE NOT is_target GROUP BY doc_id),
        ky AS (SELECT doc_id, n_grams, logw,
                      round(logw + round(-ln(-ln(
                        (${hash64Sql("concat('dsir|', CAST(doc_id AS VARCHAR))")}
                          % 1000000 + 0.5) / 1000000.0)), 9), 6) AS gkey
               FROM sc),
        cut AS (SELECT round(quantile_cont(gkey, ${1 - Corpus.DsirKeepFrac}), 4)
                         AS cut FROM ky)
        SELECT doc_id, n_grams, logw, gkey, gkey >= cut AS selected
        FROM ky CROSS JOIN cut ORDER BY doc_id"""
      }),

    // Feature assembly across documents⋈embeddings on the record id; the
    // norm is the same sequential double fold as the similarity oracles.
    QueryDef("corpus_doc_features",
      (s, dir) => Corpus.docFeatures(s, dir),
      Some("""
        SELECT d.doc_id, d.lang, d.source,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
               round(CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE)
                 / len(string_split(d.text, ' ')), 6) AS uniq_ratio,
               round(sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))), 6)
                 AS emb_norm,
               CAST(e.label AS BIGINT) AS label
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        ORDER BY d.doc_id""")),

    // Domain mixing: per-source token shares, the cap-derived downsample
    // rate, and the deterministic keep-hash survivors. DuckDB's sum(BIGINT)
    // widens to HUGEINT → CAST back; the rate×mod comparison runs in
    // DOUBLE on both sides (Spark casts the pmod explicitly).
    QueryDef("corpus_domain_mix",
      (s, dir) => Corpus.domainMix(s, dir),
      Some(s"""
        WITH perdoc AS (SELECT source, doc_id,
                               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                        FROM documents),
        bysrc AS (SELECT source, count(*) AS n_docs, sum(n_tokens) AS src_tokens
                  FROM perdoc GROUP BY 1),
        tot AS (SELECT CAST(sum(src_tokens) AS DOUBLE) AS total_tokens FROM bysrc),
        rates AS (SELECT source, n_docs, CAST(src_tokens AS BIGINT) AS src_tokens,
                         round(src_tokens / total_tokens, 6) AS share,
                         round(least(CAST(1.0 AS DOUBLE),
                           ${Corpus.DomainCapShare} * total_tokens / src_tokens), 6)
                           AS sample_rate
                  FROM bysrc CROSS JOIN tot),
        kept AS (SELECT p.source, count(*) AS n_kept, sum(p.n_tokens) AS kept_tokens
                 FROM perdoc p JOIN rates r USING (source)
                 WHERE ${hash64Sql("concat('dmix|', CAST(p.doc_id AS VARCHAR))")}
                         % ${Corpus.DomainKeepMod}
                       < r.sample_rate * ${Corpus.DomainKeepMod}
                 GROUP BY 1)
        SELECT r.source, r.n_docs, r.src_tokens, r.share, r.sample_rate,
               coalesce(k.n_kept, 0) AS n_kept,
               CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
        FROM rates r LEFT JOIN kept k USING (source)
        ORDER BY r.source""")),

    // Temperature-based multilingual mixing (XLM α-sampling, α = 0.5):
    // q_l ∝ √p_l — sqrt is IEEE-correctly-rounded in both engines, the
    // one temperature needing no libm trust; the √p sum is the 9-dp
    // DECIMAL order-independent discipline; the q/p boost is normalized
    // to a downsample-only rate (most-boosted language keeps all).
    QueryDef("corpus_temperature_mix",
      (s, dir) => Corpus.temperatureMix(s, dir),
      Some(s"""
        WITH perdoc AS (SELECT lang, doc_id,
                               CAST(len(string_split(text, ' ')) AS BIGINT)
                                 AS n_tokens
                        FROM documents),
        bylang AS (SELECT lang, count(*) AS n_docs,
                          sum(n_tokens) AS lang_tokens
                   FROM perdoc GROUP BY 1),
        tot AS (SELECT CAST(sum(lang_tokens) AS DOUBLE) AS total FROM bylang),
        sp AS (SELECT lang, n_docs, CAST(lang_tokens AS BIGINT) AS lang_tokens,
                      round(lang_tokens / total, 6) AS share,
                      CAST(round(sqrt(lang_tokens / total), 9)
                           AS DECIMAL(28,9)) AS sp
               FROM bylang CROSS JOIN tot),
        den AS (SELECT CAST(sum(sp) AS DOUBLE) AS den FROM sp),
        tsh AS (SELECT s.lang, s.n_docs, s.lang_tokens, s.share,
                       round(CAST(s.sp AS DOUBLE) / den, 6) AS temp_share
                FROM sp s CROSS JOIN den),
        bst AS (SELECT *, round(temp_share / share, 6) AS r0 FROM tsh),
        rm AS (SELECT max(r0) AS rmax FROM bst),
        rates AS (SELECT lang, n_docs, lang_tokens, share, temp_share,
                         round(r0 / rmax, 6) AS sample_rate
                  FROM bst CROSS JOIN rm),
        kept AS (SELECT p.lang, count(*) AS n_kept,
                        sum(p.n_tokens) AS kept_tokens
                 FROM perdoc p JOIN rates r USING (lang)
                 WHERE ${hash64Sql("concat('tmix|', CAST(p.doc_id AS VARCHAR))")}
                         % ${Corpus.TempKeepMod}
                       < r.sample_rate * ${Corpus.TempKeepMod}
                 GROUP BY 1)
        SELECT r.lang, r.n_docs, r.lang_tokens, r.share, r.temp_share,
               r.sample_rate,
               coalesce(k.n_kept, 0) AS n_kept,
               CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
        FROM rates r LEFT JOIN kept k USING (lang)
        ORDER BY r.lang""")),

    // Weighted reservoir (Efraimidis–Spirakis): priority arithmetic must
    // run in DOUBLE end-to-end — a bare 0.5/1000000.0 literal chain
    // divides as DECIMAL in DuckDB and diverges from Spark's IEEE fold
    // (same trap as the RRF oracle below).
    QueryDef("corpus_weighted_reservoir",
      (s, dir) => Corpus.weightedReservoir(s, dir),
      Some(s"""
        WITH p AS (SELECT doc_id, source, n_chars,
                          (${hash64Sql("concat('wres|', CAST(doc_id AS VARCHAR))")}
                             % ${Corpus.DomainKeepMod} + CAST(0.5 AS DOUBLE))
                            / CAST(${Corpus.DomainKeepMod} AS DOUBLE) AS u
                   FROM documents),
        pr AS (SELECT doc_id, source, n_chars,
                      round(u, 6) AS u_out,
                      round(-ln(u) / sqrt(CAST(n_chars AS DOUBLE)), 9) AS priority
               FROM p)
        SELECT doc_id, source, n_chars, u_out AS u, priority,
               row_number() OVER (ORDER BY priority, doc_id) AS rnk
        FROM pr ORDER BY priority, doc_id LIMIT ${Corpus.ReservoirK}""")),

    // Global training-data shuffle into shards: deterministic salted-hash
    // deal + in-shard pseudo-random order. The oracle's ORDER BY is the
    // whole contract — the dump's row order certifies the permutation.
    QueryDef("corpus_shuffle_shards",
      (s, dir) => Corpus.shuffleShards(s, dir),
      Some(s"""
        SELECT skey % ${Corpus.ShardCount} AS shard, skey, doc_id, n_tokens
        FROM (SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                     ${hash64Sql("concat('shard|', CAST(doc_id AS VARCHAR))")} AS skey
              FROM documents)
        ORDER BY shard, skey, doc_id""")),

    // Deterministic SOURCE-INTERLEAVED training order (r18): round-robin
    // across sources — epoch_pos is the doc's rank within its source,
    // the global training order is (epoch_pos, source, doc_id), and (the
    // shuffle-shards discipline) the ordered dump IS the contract: no
    // global ordinal window.
    QueryDef("corpus_interleave",
      (s, dir) => Corpus.interleave(s, dir),
      Some("""
        SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
                    AS BIGINT) AS epoch_pos
        FROM documents
        ORDER BY epoch_pos, source, doc_id""")),

    // Hybrid RRF: the lexical leg is the bm25 CTE chain verbatim; the
    // semantic leg ranks exact cosine against the query vector. CAST the
    // 1.0 to DOUBLE — a bare 1.0/(k+r) divides as DECIMAL in DuckDB and
    // diverges from Spark's IEEE division.
    QueryDef("similarity_hybrid_rrf",
      (s, dir) => Similarity.hybridRrf(s, dir),
      Some(s"""
        WITH $bm25Ctes,
        lex AS (SELECT doc_id,
                       row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
                FROM agg ORDER BY score DESC, doc_id LIMIT ${Corpus.Bm25TopK}),
        q AS (SELECT embedding AS qv FROM embeddings
              WHERE vec_id = ${Similarity.HybridQueryVec}),
        sc AS (SELECT vec_id AS doc_id,
                      ${LlmQueries.cosineSql("qv", "embedding")} AS cosine
               FROM embeddings CROSS JOIN q
               WHERE vec_id <> ${Similarity.HybridQueryVec}),
        sem AS (SELECT doc_id,
                       row_number() OVER (ORDER BY cosine DESC, doc_id) AS sem_rank
                FROM sc ORDER BY cosine DESC, doc_id LIMIT ${Similarity.HybridTopK})
        SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank,
               round(coalesce(CAST(1.0 AS DOUBLE) / (${Similarity.RrfK} + lex_rank), 0) +
                     coalesce(CAST(1.0 AS DOUBLE) / (${Similarity.RrfK} + sem_rank), 0),
                     6) AS rrf_score
        FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id
        ORDER BY rrf_score DESC, doc_id""")),

    // Per-source data card (Datasheets/Dolma-style release report):
    // volumes, mean length, language inventory (+ top language, count
    // desc / lexicographic tiebreak), and exact-duplicate exposure — a
    // source is charged for md5 duplicates it shares with OTHER sources
    // (corpus-wide hash counts, the dedup_exact currency). All sums cast
    // to BIGINT so both engines emit identical integer types; means are
    // one IEEE division of exact long sums.
    QueryDef("corpus_data_card",
      (s, dir) => Corpus.dataCard(s, dir),
      Some("""
        WITH base AS (SELECT source, lang, n_chars,
                             CAST(len(string_split(text, ' ')) AS BIGINT)
                               AS n_tokens,
                             md5(text) AS h
                      FROM documents),
        dh AS (SELECT h FROM (SELECT h, count(*) AS nc FROM base GROUP BY h)
               WHERE nc >= 2),
        fl AS (SELECT b.*, CASE WHEN dh.h IS NULL THEN 0 ELSE 1 END AS is_dup
               FROM base b LEFT JOIN dh ON b.h = dh.h),
        per AS (SELECT source, count(*) AS n_docs,
                       CAST(sum(n_chars) AS BIGINT) AS total_chars,
                       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                       round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 6)
                         AS mean_tokens,
                       count(DISTINCT lang) AS n_langs,
                       CAST(sum(is_dup) AS BIGINT) AS n_dup_docs
                FROM fl GROUP BY source),
        lc AS (SELECT source, lang, count(*) AS cnt FROM documents
               GROUP BY 1, 2),
        tp AS (SELECT source, lang AS top_lang FROM (
                 SELECT *, row_number() OVER (PARTITION BY source
                           ORDER BY cnt DESC, lang) AS rn FROM lc)
               WHERE rn = 1)
        SELECT p.source, p.n_docs, p.total_chars, p.total_tokens,
               p.mean_tokens, p.n_langs, tp.top_lang, p.n_dup_docs,
               round(CAST(p.n_dup_docs AS DOUBLE) / p.n_docs, 6) AS dup_frac
        FROM per p JOIN tp USING (source)
        ORDER BY p.source""")),

    // STREAMED twin of the data card's volume half: the same per-source
    // volumes/mean/language-inventory maintained as ONE keyed streaming
    // aggregation over a documents file stream (complete mode,
    // AvailableNow drain). The oracle recomputes the card columns in
    // batch SQL — the hash match certifies the drained stream state
    // equals the batch aggregation exactly.
    QueryDef("corpus_data_card_streamed",
      (s, dir) => graft.streaming.DataCardStream.dataCardStreamed(s, dir),
      Some("""
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                 AS total_tokens,
               round(CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
                       / count(*), 6) AS mean_tokens,
               count(DISTINCT lang) AS n_langs
        FROM documents GROUP BY source ORDER BY source"""))
  )

  /** The BM25 scoring chain (through the per-doc `agg` relation) — shared
    * by the bm25 entry and the hybrid-RRF lexical leg so the two oracles
    * cannot drift. */
  private lazy val bm25Ctes: String = s"""tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        consts AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                          CAST(sum(len(t)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
                   FROM tk),
        dl AS (SELECT doc_id, len(t) AS dl FROM tk),
        tok AS (SELECT doc_id, unnest(t) AS token FROM tk),
        tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
               FROM tok WHERE token IN (${Corpus.Bm25Query.map("'" + _ + "'").mkString(", ")})
               GROUP BY 1, 2),
        dft AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        scored AS (SELECT tf.doc_id,
                          CAST(round(
                            ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * (${Corpus.Bm25K1} + 1.0)
                              / (tf + (1.0 - ${Corpus.Bm25B} + dl * ${Corpus.Bm25B} / avgdl) * ${Corpus.Bm25K1}),
                            9) AS DECIMAL(28, 9)) AS term_score
                   FROM tf JOIN dft USING (token) JOIN dl USING (doc_id) CROSS JOIN consts),
        agg AS (SELECT doc_id, round(CAST(sum(term_score) AS DOUBLE), 6) AS score,
                       count(*) AS n_matched_terms
                FROM scored GROUP BY doc_id)"""
}
