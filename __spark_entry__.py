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
# Front-load (a) queries whose last driver record was an error (the
# TIMESTAMP_NTZ fixes — these must flip back to green), then (b) entries
# that have never had a driver row (SURVEY §2 ops J6/A7/X1-X3/P1-P5/F7/S5
# via their carrier queries, the training-data curation suite, the OLAP
# suite). Entries already green in CORRECTNESS_r01/r02 sort last — their
# hard signal is on file.
VERIFY_FIRST = [
    # (a) fixed this round — were AnalysisException rows in r02
    "session_windows_batch",
    "lag_lead_gaps",
    "rolling_7day_range_frame",
    # (b) SURVEY §2 ops with no driver row yet
    "normalize_trips_pipeline",      # P1-P3, P5, F7, S5
    "correlated_scalar_subquery",    # J6
    "json_array_collect",            # A7
    "map_fold_merge",                # X1
    "dock_deep_merge_nested_maps",   # X2
    "route_waypoints_enrichment",    # X3
    # training-data ops the round-1 verdict listed as driver-untested
    "fuzzy_dedup_levenshtein",
    "ivf_fixed_centroid_assignment",
    "pii_redaction",
    "doc_repetition_stats",
    "tfidf_top_terms",
    "doc_chunking",
    "token_packing",
    "per_group_quota_sample",
    "salted_skew_join",
    "zorder_clustering_buckets",
    "equi_depth_histogram",
    # OLAP / reshaping suite (round-2 additions, never driver-run)
    "pricing_summary_report",
    "shipping_priority_topk",
    "order_priority_semi",
    "local_supplier_volume",
    "returned_items_topk",
    "promo_revenue_share",
    "unpivot_lineitem_measures",
    "grouping_sets_doc_counts",
    # corpus curation / dedup depth
    "decontamination_ngram_overlap",
    "incremental_dedup_exact",
    "incremental_dedup_neardup",
    "dedup_ngram_containment",
    "dedup_cluster_keepers",
    "boilerplate_prefix_scrub",
    "quality_percentile_gate",
    "bigram_lm_cross_entropy",
    "cross_split_contamination",
    "corpus_shuffle_shards",
    "dedup_pagerank_hubs",
    # embedding linalg
    "embedding_l2_normalize",
    "embedding_dim_covariance",
    "matryoshka_truncate_renormalize",
    "embedding_int8_quantize",
    "random_projection_sketch",
    # sequence / cohort analytics
    "train_val_test_split",
    "weighted_source_mix",
    "conversion_funnel",
    "retention_cohorts",
    "event_transition_matrix",
    "time_spine_gap_fill",
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
