"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

Each query is executed with a count-style action that forces full
materialization of the result (collect to driver is excluded — we measure
engine work, not py4j transfer)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citibike_deep_dive_spark.plans import CATALOG  # noqa: E402
from citibike_deep_dive_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the reference-parity pipeline shapes + the heavy
# training-data operators. Names must exist in CATALOG.
HEADLINE = [
    "linegraph_conditional_counts",
    "heatmap_hourly_counts",
    "dock_flow_full_outer",
    "monthly_to_yearly_rollup",
    "json_object_aggregate",
    "additive_upsert_merge",
    "topk_per_group_window",
    "multi_predicate_filter",
    "group_count_min_time",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_lsh_candidate_pairs",
    "dedup_simhash",
    "ann_brute_force_topk",
    "ann_ivf_label_topk",
    "text_quality_scores",
    "text_language_id",
    "tumbling_window_hourly",
    "session_windows_batch",
]


def main() -> None:
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="citibike-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing outside the timed region
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = CATALOG[name]
        start = time.perf_counter()
        df = spec.build(spark, SF_DIR)
        n = df.write.format("noop").mode("overwrite").save()  # noqa: F841 full materialization
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
