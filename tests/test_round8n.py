"""Semantic properties of the round-8 continuation batch 12
(plans/round8n.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math
from collections import Counter

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_rocchio_excludes_query_terms_and_ranks_by_weight(spark):
    rows = CATALOG["rocchio_query_expansion"].build(spark, SF_DIR).collect()
    assert len(rows) == 15
    assert {"spark", "vector", "merge"}.isdisjoint({r["term"] for r in rows})
    ranked = sorted(rows, key=lambda r: r["rank"])
    weights = [r["rocchio_weight"] for r in ranked]
    assert weights == sorted(weights, reverse=True)
    for r in rows:
        assert 1 <= r["rel_docs"] <= 10
        assert r["df"] >= r["rel_docs"]
        assert r["rocchio_weight"] > 0


def test_ccf_zero_lag_is_pearson_and_symmetric_support(spark):
    rows = {r["lag"]: r for r in
            CATALOG["cross_correlation_lagged"].build(spark, SF_DIR).collect()}
    assert set(rows) == set(range(-7, 8))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily: dict = {}
    for e in ev:
        d = e["ts"].date() if hasattr(e["ts"], "date") else e["ts"]
        xy = daily.setdefault(d, [0, 0])
        if e["event_type"] == "click":
            xy[0] += 1
        elif e["event_type"] == "view":
            xy[1] += 1
    xs = [v[0] for v in daily.values()]
    ys = [v[1] for v in daily.values()]
    n = len(xs)
    xbar, ybar = sum(xs) / n, sum(ys) / n
    sx = math.sqrt(sum(x * x for x in xs) / n - xbar * xbar)
    sy = math.sqrt(sum(y * y for y in ys) / n - ybar * ybar)
    r0 = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / (n * sx * sy)
    assert abs(rows[0]["ccf"] - r0) < 1e-4  # lag 0 = Pearson (n-normalized)
    assert rows[0]["n_overlap"] == n
    for lag in range(1, 8):
        assert rows[lag]["n_overlap"] == n - lag
        assert rows[-lag]["n_overlap"] == n - lag
    for r in rows.values():
        assert -1.01 <= r["ccf"] <= 1.01


def test_mann_kendall_python_recompute(spark):
    rows = CATALOG["mann_kendall_trend"].build(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily: dict = {}
    for e in ev:
        d = e["ts"].date()
        daily[d] = daily.get(d, 0) + int(round(e["value"] * 100))
    days = sorted(daily)
    y = [daily[d] for d in days]
    n = len(y)
    s = sum(
        (1 if y[j] > y[i] else -1 if y[j] < y[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(y)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    assert r["n_days"] == n
    assert r["s_stat"] == s
    assert abs(r["var_s"] - round(var_s, 4)) < 1e-9
    zexp = (s - 1) / math.sqrt(var_s) if s > 0 else (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
    assert abs(r["z_stat"] - zexp) < 1e-4
    assert r["trend"] == ("increasing" if s > 0 else "decreasing" if s < 0 else "none")


def test_haar_parseval_identity(spark):
    rows = CATALOG["haar_wavelet_energy"].build(spark, SF_DIR).collect()
    assert {r["level"] for r in rows} == {0, 1, 2, 3, 4}
    by = {r["level"]: r for r in rows}
    assert by[1]["n_coeffs"] == 8
    assert by[2]["n_coeffs"] == 4
    assert by[3]["n_coeffs"] == 2
    assert by[4]["n_coeffs"] == 1
    assert by[0]["n_coeffs"] == 1
    # Parseval: energies sum to the raw sum of squares of the 16 days
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily: dict = {}
    for e in ev:
        d = e["ts"].date()
        daily[d] = daily.get(d, 0) + int(round(e["value"] * 100))
    y = [daily[d] for d in sorted(daily)[:16]]
    raw = sum(v * v for v in y) / 10000.0  # dollars^2
    total = sum(r["energy"] for r in rows)
    assert abs(total - raw) / raw < 1e-6
    shares = sum(r["energy_share"] for r in rows)
    assert abs(shares - 1.0) < 1e-4
