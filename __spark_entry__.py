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
# Round-10 ordering (VERDICT r9 items 1, 2, 6, 7 + re-verify-on-change
# invariant): (a) the two NEW codec entries (real PNG pixel decode and
# real WAV PCM decode, verdict items 6-7 — new adds land in VERIFY_FIRST
# of their own round per item 8); (b) heaps_law_loglog_fit, the r9 red
# row, re-queued after the DuckDB-1.2.0-proof micro-unit rewrite
# (verdict item 2); (c) the never-driver-verified backlog (verdict
# item 1) — the three r9 adds first (neyman + boilerplate also carry
# this round's ADVICE fixes), then the audited r8 tail. The verdict's
# demands total 51 against the 50-slot budget, so exactly one backlog
# entry (logrank_churn_arms, the audited tail) rolls to the r11 head in
# VERIFY_NEXT. Every entry preflight.py-exact before commit.
VERIFY_FIRST = [
    # (a) NEW this round — the last two real codec paths
    "multimodal_png_pixel_stats",
    "multimodal_wav_audio_stats",
    # (b) the r9 red row, fixed (micro-unit BIGINT quantization)
    "heaps_law_loglog_fit",
    # (b2) implementation changed this round (re-verify-on-change):
    # ADC sum unrolled out of the interpreted aggregate() lambda +
    # codes frame lazily checkpointed (index-time artifact) — both
    # value-preserving by construction and preflight-exact, but the
    # invariant wants driver rows
    "ann_ivfpq_adc_topk",
    "ann_ivfpq_rerank_exact",
    # (c) never-driver-verified backlog: round-9 adds first
    "triplet_semihard_mining",
    "neyman_stratified_allocation",
    "boilerplate_ngram_flags",
    # then the audited round-8 backlog tail, original order
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
]

# Never driver-verified entries that did NOT fit this round's 50-slot
# budget: the audited-order backlog tail, displaced by the two NEW
# codec entries + the two changed-this-round ADC carriers (the verdict's
# demands plus the re-verify-on-change invariant total 53 against 50).
# All preflight.py-exact at sf0.01. Placed immediately after
# VERIFY_FIRST in queries() so any budget beyond 50 reaches them, and
# queued as the round-11 VERIFY_FIRST head. r11 rotation plan (r9
# verdict item 3): after these, fill the remaining ~46 slots with the
# OLDEST-evidence rows — 80 queries' last green row dates from r2/r3
# (derive the exact list by folding CORRECTNESS_r0*.json: last green
# round per name, keep <= 3); lead with the §2 carriers the verdict
# names (linegraph_conditional_counts, heatmap_hourly_counts,
# dock_flow_full_outer, topk_per_group_window, the join/filter
# entries), then the training-extension remainder alphabetically; the
# ~34 that miss r11's budget head r12.
VERIFY_NEXT = [
    "esd_outlier_rounds",
    "lof_embedding_outliers",
    "logrank_churn_arms",
    # round-10 adds (new families: unigram-LM tokenizer, Kudo 2018 —
    # completes the tokenizer-training pair next to BPE; chrF,
    # Popovic 2015 — the generation-eval/corpus-diversity metric
    # family, integer-exact by design); land in the r11 VERIFY_FIRST
    # head per the new-adds-verify-next-round rule
    "unigram_lm_viterbi_segments",
    "chrf_adjacent_doc_pairs",
    # round-10 add: multimodal DSP — real decode feeding a SQL-side
    # DFT (spectral centroid / dominant bin / band energy); extends
    # the multimodal surface from payload stats to feature extraction
    "multimodal_wav_spectral_features",
    # round-10 add: perceptual image hashing (pHash) — DCT-sign
    # near-dup buckets over real decoded pixels, the image analog of
    # the text LSH dedup family
    "multimodal_image_phash_buckets",
]

# The 80 queries whose LAST green driver row dates from rounds 2-3
# (derived by folding CORRECTNESS_r0*.json: last green round per name,
# keep <= 3; ALL 80 re-validated builder-side this round by the r10
# preflight --all sweep, 0 problems). The r11 rotation (r9 verdict
# item 3): VERIFY_FIRST = VERIFY_NEXT (7 never-driver-verified) + the
# first 43 names below; the remaining 37 head r12. Ordered with the
# verdict-named §2 carriers first, then alphabetical.
STALE_EVIDENCE_R2R3 = [
    "linegraph_conditional_counts",
    "heatmap_hourly_counts",
    "dock_flow_full_outer",
    "topk_per_group_window",
    "anti_join_missing",
    "correlated_scalar_subquery",
    "exists_semi_join",
    "not_in_subquery",
    "multi_predicate_filter",
    "conditional_pair_swap",
    "left_join_enrich_default",
    "additive_upsert_merge",
    "anyvalue_deterministic",
    "monthly_to_yearly_rollup",
    "json_object_aggregate",
    "json_array_collect",
    "map_fold_merge",
    "normalize_trips_pipeline",
    "union_by_name",
    "state_gate_new_periods",
    "asof_join_latest_profile",
    "boilerplate_prefix_scrub",
    "case_value_normalization",
    "conversion_funnel",
    "corpus_shuffle_shards",
    "corpus_top_ngrams",
    "cross_split_contamination",
    "cube_type_day",
    "dedup_cluster_keepers",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_ngram_containment",
    "deterministic_sample",
    "distinct_aggregates",
    "distinct_years_ordered",
    "doc_chunking",
    "doc_repetition_stats",
    "embedding_l2_normalize",
    "embedding_near_dup_sign_lsh",
    "equi_depth_histogram",
    "event_transition_matrix",
    "fuzzy_dedup_levenshtein",
    "group_count_min_time",
    "grouping_sets_doc_counts",
    "incremental_dedup_exact",
    "incremental_dedup_neardup",
    "ivf_fixed_centroid_assignment",
    "json_extract_props",
    "lag_lead_gaps",
    "local_supplier_volume",
    "multimodal_frame_sampling",
    "multimodal_image_dimensions",
    "order_priority_semi",
    "per_group_quota_sample",
    "pii_redaction",
    "pricing_summary_report",
    "promo_revenue_share",
    "quality_percentile_gate",
    "range_join_interval",
    "retention_cohorts",
    "returned_items_topk",
    "rolling_7day_range_frame",
    "rollup_year_month",
    "running_total_frame",
    "salted_skew_join",
    "shipping_priority_topk",
    "skew_salted_aggregate",
    "text_fingerprints",
    "text_language_id",
    "text_quality_scores",
    "text_token_counts",
    "tfidf_top_terms",
    "time_spine_gap_fill",
    "token_packing",
    "train_val_test_split",
    "tumbling_window_hourly",
    "unpivot_lineitem_measures",
    "value_percentiles_exact",
    "weighted_source_mix",
    "zorder_clustering_buckets",
]



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions),
    ordered so the driver's bounded verify covers new ground each round."""
    head = set(VERIFY_FIRST) | set(VERIFY_NEXT) | set(STALE_EVIDENCE_R2R3)
    ordered = [n for n in VERIFY_FIRST if n in CATALOG]
    ordered += [n for n in VERIFY_NEXT if n in CATALOG]
    # oldest driver evidence next, so any verify budget beyond the two
    # queues starts re-rotating r2/r3-era rows (r9 verdict item 3)
    ordered += [n for n in STALE_EVIDENCE_R2R3 if n in CATALOG]
    ordered += [n for n in CATALOG if n not in head]
    return {name: CATALOG[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; rows-only ops are omitted."""
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle}
