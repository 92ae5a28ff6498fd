"""Semantic properties of the round-8 continuation batch 7
(plans/round8i.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math
from collections import Counter

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_adamic_adar_predictions_are_nonedges_with_valid_scores(spark):
    rows = CATALOG["link_prediction_adamic_adar"].build(spark, SF_DIR).collect()
    if not rows:  # tiny sf may have no open wedges
        return
    from citibike_deep_dive_spark.plans.round6 import mutual_knn_pairs

    edges = {
        (r["id_a"], r["id_b"])
        for r in mutual_knn_pairs(spark, SF_DIR).collect()
    }
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    scores = [r["adamic_adar"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        a, b = r["vec_a"], r["vec_b"]
        assert a < b
        assert (a, b) not in edges  # predictions are NON-edges
        assert r["common_neighbors"] >= 1
        # AA score bounds given the common-neighbor count: each neighbor
        # has degree >= 2, so each term is at most 1/ln(2)
        assert r["adamic_adar"] <= r["common_neighbors"] / math.log(2) + 1e-6
        assert r["adamic_adar"] > 0


def test_adamic_adar_matches_python_for_top_pair(spark):
    rows = CATALOG["link_prediction_adamic_adar"].build(spark, SF_DIR).collect()
    if not rows:
        return
    from citibike_deep_dive_spark.plans.round6 import mutual_knn_pairs

    edges = {
        (r["id_a"], r["id_b"])
        for r in mutual_knn_pairs(spark, SF_DIR).collect()
    }
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    top = rows[0]
    common = nbrs[top["vec_a"]] & nbrs[top["vec_b"]]
    assert len(common) == top["common_neighbors"]
    expect = sum(round(1e6 / math.log(len(nbrs[z]))) for z in common) / 1e6
    assert abs(top["adamic_adar"] - expect) < 1e-5


def test_count_sketch_estimates_track_truth_for_heavy_hitters(spark):
    rows = CATALOG["count_sketch_estimates"].build(spark, SF_DIR).collect()
    assert len(rows) == 20
    counts = [r["true_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r["error"] == r["cs_estimate"] - r["true_count"]
    # median-of-5 signed estimates: heavy hitters should be close in
    # RELATIVE terms (collision noise is additive, not multiplicative)
    worst = max(abs(r["error"]) / r["true_count"] for r in rows)
    assert worst < 1.0  # estimates are the right order of magnitude
    # and at least half the heavy hitters should be within 25%
    close = sum(1 for r in rows if abs(r["error"]) <= 0.25 * r["true_count"])
    assert close >= 10


def test_silhouette_bounds_and_partition(spark):
    rows = CATALOG["silhouette_simplified_ivf"].build(spark, SF_DIR).collect()
    assert rows
    n_vec = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r["n_vectors"] for r in rows) == n_vec  # cells partition corpus
    overall = rows[0]["overall_silhouette"]
    for r in rows:
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert r["overall_silhouette"] == overall  # constant column
    # the overall is the n-weighted mean of the per-cell means
    weighted = sum(r["mean_silhouette"] * r["n_vectors"] for r in rows) / n_vec
    assert abs(overall - weighted) < 1e-3
    # k-means on real data should separate at least somewhat
    assert overall > -0.5
