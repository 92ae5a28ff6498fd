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
# Round-5 ordering (VERDICT r4 item 8): (a) the one r4-red row, fixed
# this round (INT->DOUBLE cast on min/max_words); (b) the only
# oracle-bearing entry never driver-verified (ann_recall_report missed
# r4's 50-row budget at rank 51); (c) the two sketches upgraded from
# rows-only to value-checked oracles this round; (d) round-5 additions;
# (e) lowest-confidence greens — queries whose implementation changed
# after their last green row. Everything already green on file sorts
# last. ivf_kmeans_cells — formerly the one rows-only query — is now
# value-checked too: decimal-exact centroid means make each iteration
# bit-reproducible, so the oracle unrolls the finite loop as generated
# CTE blocks. Every catalog entry now carries an exact oracle.
VERIFY_FIRST = [
    # (a) red in r4 — fixed this round (preflight: OK rows=97)
    "corpus_manifest",
    # (b) never driver-verified, oracle-bearing (preflight: OK rows=5)
    "ann_recall_report",
    # (c) upgraded rows-only -> value-checked oracles this round
    "approx_distinct_hll",
    "approx_quantiles_sketch",
    # (d) round-5 additions
    "prefix_filter_jaccard_join",
    "bm25_doc_scores",
    "inverted_index_postings",
    "compaction_bin_packing",
    "customer_order_distribution",
    "top_revenue_suppliers",
    "small_quantity_revenue",
    "late_shippers_in_shared_orders",
    "embedding_pq_codes",
    "constraint_audit",
    "minhash_jaccard_estimate",
    "late_arrival_audit",
    "ann_ivfpq_adc_topk",
    "pareto_frontier_by_brand",
    "language_confusion_matrix",
    "cdc_latest_state_apply",
    "vocab_gini_by_source",
    "frequent_brand_pairs",
    "min_cost_supplier_per_part",
    "nation_market_share",
    "product_type_profit",
    "important_part_value_share",
    "supplier_count_by_part_attrs",
    "rrf_hybrid_retrieval",
    "bpe_merge_candidates",
    "semdedup_prune",
    "simhash_hamming_pairs",
    "ohlc_resample_daily",
    "hard_negative_mining",
    "duplicate_provenance_matrix",
    "ab_test_welch_t",
    "seasonal_baseline_profile",
    "feature_hashing_sparse",
    "linear_gd_gradient_step",
    "knn_classifier_eval",
    "psi_drift_report",
    # (e) implementation changed since last green driver row
    "embedding_near_dup_pairs",
    "ann_brute_force_topk",
    "ann_ivf_label_topk",
    "dock_deep_merge_nested_maps",
    "route_waypoints_enrichment",
    "dedup_connected_components",
    "dedup_pagerank_hubs",
    "training_corpus_prep",
    "session_windows_batch",
    # upgraded rows-only -> value-checked this round (unrolled oracle)
    "ivf_kmeans_cells",
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
