package graft

/** Engine-wide determinism net: a representative query of every major
  * shape (scan-agg, window top-N, LSH pair-gen, iterative CC, trained
  * k-means, driver-loop BPE, IVF probe, packing prefix sums, sketches,
  * ntile layouts, A-ES sampling, SemDeDup) must produce IDENTICAL
  * rows under a different `spark.sql.shuffle.partitions` — the knob
  * that changes every exchange's partitioning and so flushes out any
  * operator whose result depends on partition boundaries (float
  * accumulation order, arbitrary ties, first-wins merges).
  * Per-operator specs pin repartition invariance where it matters
  * most; this lane covers the composed query surface.
  */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val shapes = Seq(
    "q01_pricing_summary", "q10_topn_per_group", "q21_exact_dedup",
    "q24_minhash_lsh_pairs", "q43_dedup_clusters", "q53_ann_ivf_topk",
    "q64_pack_offsets", "q79_bm25_topk", "q102_kmeans_fit",
    "q107_bpe_merges", "q128_para_dedup", "q202_semdedup",
    "q222_kmv_overlap", "q228_cms_frequencies", "q233_hilbert_skipping",
    "q234_weighted_reservoir", "q238_zipf_fit",
    // round-13b shapes: bloom bit joins, grid-DBSCAN CC, HRW argmax,
    // greedy set-cover driver loop, blocked multiset pairs, exact AUC
    "q246_score_auc", "q247_bloom_skipping", "q249_dbscan_grid",
    "q251_rendezvous_shards", "q252_set_cover", "q257_weighted_jaccard",
    // round-13c shapes: EMD grid audit, GD with expdet sigmoids,
    // integer HITS power iteration, seasonal-vector driver fold
    "q267_t_closeness", "q268_logit_gate", "q269_hits",
    "q270_holt_winters",
    // round-13d shapes: Poisson-bootstrap hash weights, two-stage
    // RVQ Lloyd, threshold-stepped AP, MK pair signs, STL windows
    "q274_poisson_bootstrap", "q275_rvq_ladder",
    "q278_average_precision", "q280_mann_kendall", "q281_stl_strength",
    // round-13e shapes: pinball GD, herding argmax loop, OBF looks,
    // IPW scoring pass, centered-OLS sides, DiD cell means
    "q282_quantile_regression", "q283_herding_coreset",
    "q284_sequential_ab", "q285_ipw_ate",
    "q286_regression_discontinuity", "q287_diff_in_diff",
    // round-14 shapes: register-max HLL, ±1-sign AMS accumulators,
    // log-space NB argmax, multi-arm Pareto counts
    "q291_hll_cardinality", "q292_ams_f2", "q293_naive_bayes",
    "q290_ann_frontier",
    // round-14b shapes: register union-merge, midrank grid window,
    // 64-aggregate permutation pass, stump impurity argmin, BH rank
    "q300_hll_overlap", "q301_mann_whitney", "q302_permutation_test",
    "q294_gini_stump", "q296_bh_fdr",
    // round-14c shapes: delete-a-block ds8 fold, degree-join moments
    "q304_jackknife_se", "q305_degree_assortativity",
    // round-15 shapes: banded audio hamming, log-bucket rank select,
    // automaton match emission order
    "q308_audio_neardup", "q310_hdr_quantiles", "q311_blocklist",
    "q313_otsu_gate")

  private def snapshot(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(_.toString).sorted.toSeq

  test("representative query shapes are shuffle-partition invariant") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val base = shapes.map(n => n -> snapshot(n)).toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      for (n <- shapes)
        assert(snapshot(n) === base(n),
          s"$n changed under shuffle.partitions=7")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
