package graft

import org.apache.spark.sql.functions.col

/** Partition-count invariance — the property a 1000-executor
  * scale-out actually rests on: every query's RESULT must be
  * byte-identical whether the shuffle ran with 4 partitions or 7.
  * The DuckDB parity gate proves correctness under ONE partitioning;
  * this spec varies the partitioning and would catch any
  * order-dependent aggregation, float summation drift, partition-
  * local ranking, or driver-finish/distributed divergence that
  * parity alone could mask. Targets are the queries whose plans are
  * most partition-sensitive: iterative graph loops, dedup/sketch
  * aggregates, global range-partition arithmetic, window families.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val targets = Seq(
    "q29_ntile", "q38_pack_sequences", "q44_uniform_sample",
    "q47_hist_quantile", "q50_spearman", "q52_collection_stats",
    "t12_countmin_pure", "d03_minhash_lsh", "d06_dup_clusters",
    "d11_cdc_chunks", "g01_pagerank", "g05_kcore", "g06_ppr_topk",
    "q49_reachability", "e02_sessionize", "s08_ivfpq",
    // round-7: wedge-aggregate top-k, prefix-filter candidate set,
    // two-pass rank-picked medians, global moment aggregate, register
    // max-merge + inclusion-exclusion
    "g07_jaccard_link", "d14_containment", "q55_mad",
    "g08_assortativity", "q57_hll_setops",
    // round-8: lag-window transition counts, four-way shared-
    // Exchange rank windows, nano-integer BM25 sums
    "q58_markov", "q59_sort_compare", "q60_search_score",
    "q61_importance_resample", "d15_semdedup", "t14_ccnet_buckets",
    // round-9: Lloyd + window argmax audits, set-collection merge
    "s09_ann_recall", "s10_cluster_quality", "q62_alpha_merge",
    // round-10: frontier-delta BFS loop, corpus-total PMI ratios,
    // per-user CUSUM argmax windows, global top-k regression moments,
    // HyperBall register max-merge loop
    "g09_bfs_hops", "t16_pmi_collocations", "e14_changepoint",
    "t17_zipf_fit", "g10_hyperball", "q63_bpe_merges",
    "e15_seasonal_profile", "g11_harmonic", "m04_frame_energy",
    "d16_lsh_recall", "t18_langid_confusion",
    "q64_token_count_map", "d17_dedup_impact",
    // round-11: synchronous LPA loop (packed argmax), cross-doc df
    // join-back, debounce run windows, member/type multi-distinct
    "g12_label_prop", "t20_boilerplate", "e16_debounce",
    "q65_member_type_stats", "g13_modularity", "d19_edit_pairs",
    "q66_profile", "e17_ohlc", "s11_gram", "e18_bar_rollup",
    "s12_power_iter",
    // round-12: snapshot diff+apply join chain, corpus-wide dup-share
    // join-back, cluster-disjoint bounded-heap top-k (persisted
    // argmax assignment), declarative container writer + probe
    "q67_apply_ops", "t22_source_report", "s13_hard_negatives",
    "m05_header_probe",
    // round-13: eigenvector-driven Householder rotation + integer PQ,
    // mutual-best community merge matching
    "s14_opq_rotate", "g14_refine_communities",
    // round-14: NB trainer (map-side class-count collapse + bounded
    // ln table) and its exact integer-scored eval
    "t24_nb_train", "t25_nb_eval",
    // round-15: per-source KL drift (three marginals off one persisted
    // bounded cell table), target-trained LM scoring (persisted model,
    // broadcast lookups, per-doc tf aggregate)
    "t26_source_drift", "t27_target_lm",
    // round-15: two-phase grounding + last-write-wins aggregates
    "q68_compact_ops",
    // round-18: source-pair vocabulary intersection (persisted
    // posting self-join), per-user replay-order running-max window
    "d18_source_overlap", "e19_lateness_profile",
    // round-19: keep-first span-removal (global min-struct + flag
    // join + per-doc reassembly), unigram-LM hard-EM loop (bounded
    // top-k collects + broadcast-model Viterbi rounds)
    "d20_span_removal", "t29_unigram_train",
    // round-20: stride-1 keep-first substring removal (global
    // min-struct over window keys + coverage join + reassembly),
    // md5Cap-fenced dHash recall audit (TakeOrdered sample draw)
    "d21_substr_removal", "m09_dhash_recall")

  test("results are identical under 4 vs 7 shuffle partitions") {
    val dir = sf("sf0.001")
    def runWith(name: String, parts: String): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val df = Queries.all(name)(spark, dir)
        df.select(df.columns.sorted.map(col).toSeq: _*)
          .collect().map(_.toString).sorted.toSeq
      } finally spark.sharedState.cacheManager.clearCache()
    }
    try {
      targets.foreach { name =>
        val a = runWith(name, "4")
        val b = runWith(name, "7")
        assert(a.nonEmpty && a == b,
          s"$name differs between 4 and 7 shuffle partitions")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }
}
