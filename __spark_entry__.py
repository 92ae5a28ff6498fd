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
# Round-9 ordering (VERDICT r8 item 1 + re-verify-on-change invariant):
# (a) queries whose implementation changed or is NEW this round — the two
# ADC carriers (per-query distance sub-tables + Arrow-vectorized PQ codes
# stage, VERDICT item 2), chunk_dedup_reconstruct (keys-only owner
# election + single text shuffle, VERDICT item 3) and the five gate/graph queries touched by the
# ADVICE fixes (knn_graph_assortativity mean_degree = 2E/n; the shared
# plans/gates.py Gopher thresholds behind gopher_quality_rules,
# fairness_gate_parity, ucb_source_allocation, cramers_v_matrix);
# (b) the head of the never-driver-verified backlog (VERDICT item 1:
# 89 entries at r8 close -> the first 40 here; the remaining 45 stay in
# VERIFY_NEXT as the round-10 rotation head). Exactly 50 entries; every
# one preflight.py-exact before commit.
VERIFY_FIRST = [
    # (a) implementation changed in round 9
    "ann_ivfpq_adc_topk",
    "ann_ivfpq_rerank_exact",
    "gopher_quality_rules",
    "knn_graph_assortativity",
    "fairness_gate_parity",
    "ucb_source_allocation",
    "cramers_v_matrix",
    "chunk_dedup_reconstruct",
    "multimodal_bmp_pixel_stats",
    "multimodal_features",
    "ppmi_skipgram_pairs",
    # (b) never-driver-verified backlog head (r8 VERIFY_NEXT order)
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
]

# Never driver-verified entries that did NOT fit this round's 50-slot
# budget: the tail of the r8 backlog, in the same audited order (every
# one preflight.py-exact at sf0.01 — session-3 full-catalog sweep plus
# per-add preflights). Placed immediately after VERIFY_FIRST in
# queries() so any budget beyond 50 reaches them, and queued as the
# round-10 VERIFY_FIRST head.
VERIFY_NEXT = [
    # round-9 additions (preflight-exact on add; r10 verification head)
    "triplet_semihard_mining",
    "neyman_stratified_allocation",
    "boilerplate_ngram_flags",
    # displaced round-8 backlog tail
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
    "matrix_profile_motifs",
    "forecast_mase_eval",
    "dispersion_index_by_type",
    "randomized_response_prevalence",
    "embedding_anisotropy_ratio",
    "energy_distance_sources",
    "mmd_rbf_sources",
    "esd_outlier_rounds",
    "lof_embedding_outliers",
    "logrank_churn_arms",
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
