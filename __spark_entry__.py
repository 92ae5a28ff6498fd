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
# Front-load (a) the four r3-red rows, fixed this round (array outputs
# exploded to scalar grain; covariance centered) — these must flip green
# — then (b) every query that has never had a driver row across
# CORRECTNESS_r01–r03 (43 entries: the round-2/3 additions the bounded
# verify never reached). Entries already green in r01–r03 sort last —
# their hard signal is on file. The last three are rows-only (no oracle):
# the driver records the weaker rows-only check for them.
VERIFY_FIRST = [
    # (a) red in r3 — fixed this round
    "embedding_dim_covariance",
    "matryoshka_truncate_renormalize",
    "embedding_int8_quantize",
    "random_projection_sketch",
    # (b) never driver-checked: OLAP / reshaping / window depth
    "pivot_type_by_dow",
    "from_json_struct",
    "intersect_except_customers",
    "null_safe_equality_join",
    "posexplode_tokens",
    "nation_pair_trade_volume",
    "large_volume_customers",
    "frame_value_functions",
    "rank_function_suite",
    "revenue_share_of_total",
    # profiling / robust statistics
    "value_histogram",
    "zscore_outliers",
    "mad_outliers",
    "column_profile",
    "moment_aggregates",
    "winsorize_values",
    "value_trend_by_type",
    "trip_distance_stats",
    "key_skew_report",
    # corpus statistics / quality rules
    "vocab_coverage_topk",
    "pmi_bigram_collocations",
    "doc_word_entropy",
    "repeated_segment_stats",
    "vocab_growth_by_source",
    "countmin_heavy_hitters",
    "top_ngrams_per_source",
    "gopher_quality_rules",
    "c4_style_filters",
    # curation / splits / sampling
    "weighted_sample_wor",
    "temperature_source_mix",
    "cluster_safe_split",
    "corpus_manifest",
    "temporal_split_embargo",
    "scd2_history_build",
    "partition_checksums",
    "class_balance_downsample",
    "aspect_ratio_batch_plan",
    # graph / sessions / streams (batch analogs)
    "dedup_graph_triangles",
    "session_path_trigrams",
    "sliding_window_counts",
    # round-4 scale-technique additions (new this round)
    "bloom_prefilter_join",
    "global_dense_ids",
    "partition_zonemap_stats",
    "late_shipment_priority_counts",
    "discounted_brand_revenue",
    "global_sales_opportunity",
    "ann_recall_report",
    # rows-only (no oracle — weaker driver check, still worth a row)
    "ivf_kmeans_cells",
    "approx_distinct_hll",
    "approx_quantiles_sketch",
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
