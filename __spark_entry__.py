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
# Round-6 ordering (VERDICT r5 item 1): (a) the 11 round-5-tail queries
# that were committed after the 50-row budget was spent — all
# preflight-exact-verified but never driver-verified; (b) queries whose
# implementation changed this round (ADVICE fixes: decimal sums in
# nation_market_share/product_type_profit/rrf_hybrid_retrieval, lazy n in
# linear_gd_gradient_step, distinct-pair counting in
# duplicate_provenance_matrix; perf rewrites: training_corpus_prep,
# dock_deep_merge_nested_maps); (c) round-6 additions, capped so that
# (a)+(b)+(c) stays within the driver's 50-row budget (VERDICT r5 item 2);
# everything already green on file sorts last.
#
# The list is exactly 50 entries. Seven further late-round perf rewrites
# (moment_aggregates, partition_zonemap_stats, approx_quantiles_sketch,
# approx_distinct_hll, pmi_bigram_collocations, repeated_segment_stats,
# decontamination_ngram_overlap) did not fit the budget; each was
# preflight.py-exact (the driver's own sf0.01 comparison) after its
# change and again in the closing 215/215 full-catalog sweep, and they
# head the round-7 re-verify queue. Never-verified entries kept strict
# priority over re-verification of already-green ones.
VERIFY_FIRST = [
    # (a) round-5 tail: never driver-verified, preflight-exact-OK
    "late_interaction_maxsim",
    "ks_drift_statistic",
    "benford_first_digit_audit",
    "daily_count_autocorrelation",
    "ngram_novelty_fraction",
    "open_order_backlog_sweepline",
    "repeat_order_intervals",
    "revenue_decile_concentration",
    "source_sampling_rates",
    "tokenizer_fertility_by_lang",
    "touch_attribution_revenue",
    # (b) implementation changed this round
    "nation_market_share",
    "product_type_profit",
    "rrf_hybrid_retrieval",
    "bm25_doc_scores",
    "linear_gd_gradient_step",
    "duplicate_provenance_matrix",
    "training_corpus_prep",
    "dock_deep_merge_nested_maps",
    "bloom_prefilter_join",
    "dedup_lsh_candidate_pairs",
    "dedup_ngram_jaccard",
    # (b') late-round perf rewrites from the full-catalog sf0.1 sweep
    "frequent_brand_pairs",
    "bigram_lm_cross_entropy",
    "partition_checksums",
    "embedding_int8_quantize",
    "matryoshka_truncate_renormalize",
    "random_projection_sketch",
    "simhash_hamming_pairs",
    "min_cost_supplier_per_part",
    "prefix_filter_jaccard_join",
    # (c) round-6 additions (all preflight-exact at authoring time)
    "k_anonymity_audit",
    "cusum_changepoint",
    "markov_stationary_power",
    "lsh_tuning_report",
    "anova_f_by_group",
    "chi2_lang_source",
    "gini_split_scan",
    "mutual_knn_pairs",
    "dup_discounted_tokens",
    "stratified_kfold_balance",
    "vocab_zipf_fit",
    "simhash64_hamming_pairs",
    "l_diversity_audit",
    "rfm_segmentation",
    "multimodal_audio_metadata",
    "ewma_daily_volume",
    "functional_dependency_audit",
    "dup_cluster_size_histogram",
    "conflicting_label_duplicates",
]



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions),
    ordered so the driver's bounded verify covers new ground each round."""
    ordered = [n for n in VERIFY_FIRST if n in CATALOG]
    ordered += [n for n in CATALOG if n not in VERIFY_FIRST]
    return {name: CATALOG[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; rows-only ops are omitted."""
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle}
