"""Semantic properties of the round-8 continuation batch 19
(plans/round8u.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import hashlib
from collections import Counter

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_dispersion_python_recompute(spark):
    rows = CATALOG["dispersion_index_by_type"].build(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    cells: Counter = Counter()
    for e in ev:
        cells[(e["event_type"], e["ts"].date())] += 1
    by_type: dict = {}
    for (t, _), c in cells.items():
        by_type.setdefault(t, []).append(c)
    got = {r["event_type"]: r for r in rows}
    assert set(got) == set(by_type)
    for t, cs in by_type.items():
        n = len(cs)
        mean = sum(cs) / n
        var = sum((c - mean) ** 2 for c in cs) / (n - 1)
        r = got[t]
        assert r["n_days"] == n
        assert r["total"] == sum(cs)
        assert abs(r["mean_daily"] - mean) < 1e-3
        assert abs(r["var_daily"] - var) < 1e-3
        assert abs(r["dispersion_index"] - var / mean) < 1e-3
        assert abs(r["chi2_stat"] - (n - 1) * var / mean) < 1e-2


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_randomized_response_debias(spark):
    rows = CATALOG["randomized_response_prevalence"].build(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    per: dict = {}
    for d in docs:
        b = int(d["lang"] == "en")
        r = b if _h(f"rr:coin:{d['doc_id']}") % 4 < 3 else _h(
            f"rr:fake:{d['doc_id']}"
        ) % 2
        g = per.setdefault(d["source"], [0, 0, 0])
        g[0] += 1
        g[1] += r
        g[2] += b
    got = {r["source"]: r for r in rows}
    assert set(got) == set(per)
    for s, (n, nr, nt) in per.items():
        r = got[s]
        assert r["n"] == n and r["n_reported"] == nr
        assert abs(r["true_rate"] - round(nt / n, 4)) < 1e-9
        est = (nr / n - 0.125) / 0.75
        assert abs(r["estimated_rate"] - round(est, 4)) < 1e-9
        # debiased estimate is unbiased in expectation; with tiny n it
        # just has to stay in a generous band around the truth
        assert -0.5 <= r["estimated_rate"] <= 1.5


def test_anisotropy_bounds(spark):
    rows = CATALOG["embedding_anisotropy_ratio"].build(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_dims"] == 16
    # the top eigenvalue cannot exceed the total variance, and explains
    # at least an average dimension's worth
    assert r["top_eigenvalue"] <= r["total_variance"] + 1e-6
    assert r["anisotropy_ratio"] >= 1.0 - 1e-3
    assert abs(r["mean_dim_variance"] - r["total_variance"] / 16) < 1e-5
    assert 0.0 < r["variance_explained"] <= 1.0
    assert abs(
        r["anisotropy_ratio"] - r["top_eigenvalue"] / r["mean_dim_variance"]
    ) < 1e-2
