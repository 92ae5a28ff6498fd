"""Semantic properties of the round-8 continuation batch 18
(plans/round8t.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def _daily_cents(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily: dict = {}
    for e in ev:
        d = e["ts"].date()
        daily[d] = daily.get(d, 0) + int(round(e["value"] * 100))
    return [daily[d] for d in sorted(daily)]


def test_matrix_profile_python_recompute(spark):
    rows = CATALOG["matrix_profile_motifs"].build(spark, SF_DIR).collect()
    y = _daily_cents(spark)
    w = 7
    npos = len(y) - w + 1
    assert len(rows) == npos

    def d2(p, q):
        return sum((y[p + i] - y[q + i]) ** 2 for i in range(w))

    got = {r["pos"]: r for r in rows}
    mins = {}
    for p in range(npos):
        cands = [(d2(p, q), q) for q in range(npos) if abs(p - q) >= w]
        best = min(cands)
        mins[p] = best
        r = got[p]
        assert r["nn_pos"] == best[1]
        assert abs(r["nn_dist"] - round(math.sqrt(best[0]) / 100.0, 2)) < 1e-9
    motif = min(v[0] for v in mins.values())
    discord = max(v[0] for v in mins.values())
    for p, (v, _) in mins.items():
        assert got[p]["is_motif"] == int(v == motif)
        assert got[p]["is_discord"] == int(v == discord)
    assert sum(r["is_motif"] for r in rows) >= 2  # motif pair is mutual
    assert sum(r["is_discord"] for r in rows) >= 1


def test_mase_scorecard_python_recompute(spark):
    rows = {r["model"]: r for r in
            CATALOG["forecast_mase_eval"].build(spark, SF_DIR).collect()}
    assert set(rows) == {"naive_lag1", "seasonal_naive_lag7", "drift"}
    y = _daily_cents(spark)
    n = len(y)
    scale = sum(abs(y[t] - y[t - 1]) for t in range(1, n)) / (n - 1)
    # naive
    r = rows["naive_lag1"]
    mae = sum(abs(y[t] - y[t - 1]) for t in range(1, n)) / (n - 1)
    assert r["n_evals"] == n - 1
    assert abs(r["mae"] - round(mae / 100.0, 2)) < 1e-9
    assert abs(r["mase"] - round(mae / scale, 4)) < 1e-9
    assert r["mase"] == 1.0  # naive scaled by itself
    # seasonal naive
    r = rows["seasonal_naive_lag7"]
    mae7 = sum(abs(y[t] - y[t - 7]) for t in range(7, n)) / (n - 7)
    assert r["n_evals"] == n - 7
    assert abs(r["mase"] - round(mae7 / scale, 4)) < 1e-9
    # drift
    r = rows["drift"]
    preds = [
        y[0] + int(round((y[-1] - y[0]) * t / (n - 1))) for t in range(1, n)
    ]
    maed = sum(abs(y[t] - preds[t - 1]) for t in range(1, n)) / (n - 1)
    assert abs(r["mase"] - round(maed / scale, 4)) < 1e-9
