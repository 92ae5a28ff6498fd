"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalog itself lives in ``citibike_deep_dive_spark.plans`` — one
QuerySpec per implemented operator from SURVEY.md §2 plus the
training-data extensions (dedup / similarity / text / multimodal /
streaming-analog).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citibike_deep_dive_spark.plans import CATALOG  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the LineGraph-shape conditional-count
    aggregation (SURVEY.md §7 step 3 — the reference's first derived
    table, A1 + F1 + P5)."""
    return CATALOG["linegraph_conditional_counts"].build(spark, SMOKE_SF_DIR)


# The driver's verify walks queries() in order with a bounded budget, so
# ordering decides which entries get a hard CORRECTNESS row this round.
# Round-8 ordering (VERDICT r7 items 1-2): (a) the seven round-6 perf
# rewrites whose last driver row predates the rewrite — the round-7 queue
# that never ran; (b) queries whose implementation changed THIS round:
# the three simhash carriers (lane repack 4x16 -> 3x20 after the ANSI
# long-overflow regression test; vote-identical, preflight-exact),
# moment_aggregates (left-join median for all-NULL-group parity — also
# in (a)), semdedup_prune (parameterized cell count) and
# dock_deep_merge_nested_maps (perf), plus the new
# semdedup_prune_subcells and the fourteen round-8 additions (DSIR + its resample, CCNet
# buckets, chunk dedup+reconstruct, two-stage ANN rerank, NDCG@k,
# t-closeness, filter funnel, rendezvous sharding, LPA communities, positional phrase search,
# T5 span-corruption planning, BPE merge application, suffix/prefix split detection,
# plus the five late mining additions: winnowing fingerprints,
# margin bitext mining, prototype hard-keep, token-budget water-fill,
# semantic decontamination, the four resumed-session mining queries
# (k-center coreset, token burstiness, Spearman metric agreement,
# k-core peeling) and the eleven extension-batch statistics queries
# (calibration ECE, Poisson bootstrap CI, Cohen's kappa, lang-source
# MI, coverage curve, PCA power iteration, LOO source valuation,
# isotonic calibration, Hill tail index, pairwise Wasserstein source
# distances, packing-efficiency curve, Fleiss kappa, pairwise
# Mann-Whitney AUC, margin mining over the sign-LSH shortlist — the
# production form that survives sf1 where the cross join OOMs) —
# first-time verification
# outranks evidence refresh); (c) the least-recently-verified entries
# (last green r1-r2), so the oldest evidence refreshes. Exactly 50
# entries; every one preflight.py-exact before commit.
VERIFY_FIRST = [
    # (a) round-6 perf rewrites, driver-stale since r3-r5
    "moment_aggregates",
    "partition_zonemap_stats",
    "approx_quantiles_sketch",
    "approx_distinct_hll",
    "pmi_bigram_collocations",
    "repeated_segment_stats",
    "decontamination_ngram_overlap",
    # (b) implementation changed or NEW in round 8
    "dsir_importance_weights",
    "ccnet_perplexity_buckets",
    "chunk_dedup_reconstruct",
    "ann_ivfpq_rerank_exact",
    "ndcg_at_k_eval",
    "shard_assignment_rendezvous",
    "dedup_suffix_prefix_overlap",
    "margin_bitext_mining",
    "coreset_kcenter_greedy",
    "token_burstiness_topk",
    "quality_metric_spearman",
    "dedup_kcore_peeling",
    "calibration_ece_bins",
    "bootstrap_ci_mean",
    "cohens_kappa_agreement",
    "lang_source_mutual_info",
    "coverage_curve_by_quality",
    "pca_power_iteration",
    "loo_source_value",
    "isotonic_calibration_bins",
    "hill_tail_index",
    "wasserstein_source_lengths",
    "packing_efficiency_curve",
    "fleiss_kappa_three_raters",
    "mannwhitney_source_lengths",
    "margin_bitext_ann_shortlist",
    "kaplan_meier_retention",
    "frequent_triple_itemsets",
    "revenue_change_forecast",
    "theil_sen_trend",
    "word2vec_subsampling_plan",
    "quality_score_roc_auc",
    "embedding_hubness_koccurrence",
    "conformal_quantile_coverage",
    "vocab_overlap_matrix",
    "split_half_vocab_stability",
    "circular_peak_hour",
    "corpus_entropy_rate",
    "source_minhash_similarity",
    "dedup_simhash",
    "simhash_hamming_pairs",
    "simhash64_hamming_pairs",
    "dock_deep_merge_nested_maps",
    # (c) least-recently-verified (r1-r2 evidence), oldest first
]

# Never driver-verified entries that did NOT fit this round's 50-slot
# budget (12 from the first round-8 session + 29 from the continuation
# session + 34 from the session-3 batches 9-16). Placed immediately
# after VERIFY_FIRST in queries() so any budget beyond 50 reaches them,
# and queued as the HEAD of the round-9/round-10 VERIFY_FIRST rotations
# — every one is preflight.py-exact at sf0.01 (session-3 full-catalog
# sweep: 0 problems across 327; the two batch-16 additions preflighted
# individually on add).
VERIFY_NEXT = [
    "semdedup_prune_subcells",
    "t_closeness_audit",
    "filter_funnel_attrition",
    "dedup_label_propagation",
    "dsir_importance_resample",
    "phrase_search_positional",
    "span_corruption_masks",
    "bpe_apply_merges",
    "winnowing_fingerprints",
    "prototype_hard_keep",
    "token_budget_waterfill",
    "decontamination_semantic",
    "quantile_normalize_scores",
    "kneser_ney_bigram_probs",
    "mmr_diversified_topk",
    "negative_sampling_table",
    "heaps_law_loglog_fit",
    "good_turing_bigram_smoothing",
    "dp_noisy_histogram",
    "stylometry_burrows_delta",
    "sparse_cosine_neardup_pairs",
    "sax_daily_volume_symbols",
    "ks_source_bh_fdr",
    "association_rule_directed",
    "dedup_community_modularity",
    "query_likelihood_dirichlet",
    "wilcoxon_signed_rank_daily",
    "kr20_gate_reliability",
    "ab_sequential_sprt",
    "mcnemar_gate_disagreement",
    "daily_volume_fourier",
    "bloom_fpp_audit",
    "sequential_funnel_windowed",
    "kneser_ney_heldout_perplexity",
    "brier_murphy_decomposition",
    "rolling_median_daily_volume",
    "link_prediction_adamic_adar",
    "count_sketch_estimates",
    "silhouette_simplified_ivf",
    "hits_doc_term_bipartite",
    "importance_weight_ess",
    "bradley_terry_strengths",
    "cuped_adjusted_ab",
    "js_divergence_source_unigrams",
    "adjusted_rand_labels_vs_cells",
    "doremi_domain_reweight_step",
    "kmv_sketch_set_ops",
    "knn_shapley_values",
    "log_odds_fightin_words",
    "chao1_vocab_richness",
    "knn_graph_assortativity",
    "stl_additive_decomposition",
    "rank_biased_overlap",
    "naive_bayes_lang_classifier",
    "gmm_em_step_lengths",
    "knn_label_error_candidates",
    "randomization_test_mean_diff",
    "textrank_keywords",
    "knn_shapley_ivf_shortlist",
    "rocchio_query_expansion",
    "cross_correlation_lagged",
    "mann_kendall_trend",
    "haar_wavelet_energy",
    "distance_correlation_daily",
    "clarity_score_qpp",
    "ipw_ate_estimate",
    "did_panel_estimate",
    "raking_ipf_weights",
    "min_k_prob_membership",
    "rich_club_coefficient",
    "pca_outlier_scores",
    "rake_keyphrases",
    "ransac_trend_consensus",
    "sinkhorn_transport_plan",
    "beta_binomial_shrinkage",
    "fairness_gate_parity",
    "ucb_source_allocation",
    "matrix_profile_motifs",
    "forecast_mase_eval",
    "dispersion_index_by_type",
    "randomized_response_prevalence",
    "embedding_anisotropy_ratio",
    "energy_distance_sources",
    "mmd_rbf_sources",
    "cramers_v_matrix",
    "esd_outlier_rounds",
    "lof_embedding_outliers",
    "logrank_churn_arms",
    "ppmi_skipgram_pairs",
]



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions),
    ordered so the driver's bounded verify covers new ground each round."""
    head = set(VERIFY_FIRST) | set(VERIFY_NEXT)
    ordered = [n for n in VERIFY_FIRST if n in CATALOG]
    ordered += [n for n in VERIFY_NEXT if n in CATALOG]
    ordered += [n for n in CATALOG if n not in head]
    return {name: CATALOG[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; rows-only ops are omitted."""
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle}
