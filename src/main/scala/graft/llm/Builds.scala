package graft.llm

import org.apache.spark.sql.SparkSession

/** The session-memoized INDEX BUILDS, exposed as named force-build actions
  * so the bench can time them cold (r10 VERDICT #6: memoization means a
  * bench min of `similarity_ivf_kmeans_converged` times a cache READ —
  * 0.02s against an oracle paying the full build — so build cost must be
  * its own explicit metric, not hidden inside whichever query runs first).
  *
  * Each action invokes the memoized builder exactly as its queries do and
  * materializes the persisted relation with a count (the builders persist;
  * count forces every partition). Calling one on a warm session is a cheap
  * no-op read — the bench times them on the COLD session, before the
  * warm-up pass.
  */
object Builds {

  val all: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "build_ivf_index" ->
      ((s, d) => { Similarity.ivfIndex(s, d).count(); () }),
    "build_ivf_kmeans_fixpoint" ->
      ((s, d) => { Similarity.ivfKmeansConverged(s, d).count(); () }),
    "build_bpe_merges" ->
      ((s, d) => { TextAnalysis.bpeMerges(s, d).count(); () }),
    "build_bpe_train" ->
      ((s, d) => { TextAnalysis.bpeTrainedMerges(s, d).count(); () }),
    "build_bm25_stats" ->
      ((s, d) => { Corpus.bm25PerDoc(s, d).count(); () }),
    "build_term_freqs" ->
      ((s, d) => { TextAnalysis.termFreqs(s, d).count(); () }),
    "build_bigram_freqs" ->
      ((s, d) => { TextAnalysis.bigramFreqs(s, d).count(); () }),
    "build_pq_codebook" ->
      ((s, d) => { Similarity.pqCodebook(s, d).count(); () }),
    "build_eval_tiers" ->
      ((s, d) => { Similarity.evalTiers(s, d).values.foreach(_.count()); () }),
    "build_label_prototypes" ->
      ((s, d) => { Similarity.labelComp(s, d).count(); () }),
    "build_pagerank" ->
      ((s, d) => { PageRank.pagerank(s, d).count(); () }),
    "build_pca_power" ->
      ((s, d) => { Pca.pcaPower(s, d).count(); () }),
    "build_pca_topd" ->
      ((s, d) => { Pca.pcaTopD(s, d).count(); () }),
    "build_dsv2_delete" ->
      ((s, d) => { DocsDsv2.delPath(s, d); () }),
    "build_dsv2_merge" ->
      ((s, d) => { DocsDsv2.mergePath(s, d); () }),
    "build_dsv2_evolution" ->
      ((s, d) => { DocsDsv2.evoPath(s, d); () }),
    "build_dsv2_sink" ->
      ((s, d) => { DocsDsv2.sinkPath(s, d); () }),
    "build_dsv2_compact" ->
      ((s, d) => { DocsDsv2.compactPath(s, d); () }),
    "build_sql_catalog" ->
      ((s, d) => { DocsDsv2.sqlCatalogTable(s, d); () }),
    "build_knn_pairs" ->
      ((s, d) => { Similarity.knnMutualPairs(s, d).count(); () }),
    "build_knn_graph" ->
      ((s, d) => { Similarity.knnGraph(s, d).count(); () }),
    "build_knn_clusters" ->
      ((s, d) => { Similarity.knnClusters(s, d).count(); () }),
    "build_dsv2_docs" ->
      ((s, d) => { DocsDsv2.path(s, d); () }),
    "build_dsv2_zorder" ->
      ((s, d) => { DocsDsv2.zpath(s, d); () }),
    "build_dsv2_vectors" ->
      ((s, d) => { DocsDsv2.vecPath(s, d); () }),
    "build_dsv2_snapshots" ->
      ((s, d) => { DocsDsv2.ttPath(s, d); () }),
    "build_kmeans_state" ->
      ((s, d) => { Similarity.kmeansState(s, d).count(); () }),
    "build_ngram_truth" ->
      ((s, d) => { Dedup.ngramTruth(s, d).count(); () }),
    "build_unigram_lm" ->
      // force BOTH tokenizer artifacts (vocab + the word→segmentation
      // map) so the store commit covers everything text_unigram_apply
      // reads — r14 ADVICE: with only the vocab forced, a later session
      // silently re-paid the full EM for the segmap.
      ((s, d) => {
        TextAnalysis.unigramLm(s, d).count()
        TextAnalysis.unigramSegmap(s, d).count()
        ()
      }))
}
