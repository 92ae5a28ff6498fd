"""Semantic properties of the round-8 continuation batch 5
(plans/round8g.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_fourier_matches_numpy_dft(spark):
    # r13: the query consumes a build-time literal trig table on a
    # 1/2048-turn phase grid (exact BIGINT phase index) instead of
    # per-term round(cos()*1e6), and no longer emits the engine-atan2
    # ``phase`` column — the reference recompute mirrors that exact
    # fixed-point definition, then checks it still tracks the float DFT.
    from citibike_deep_dive_spark.plans.round8g import (
        _FOURIER_COS,
        _FOURIER_PHASE_BINS,
        _FOURIER_SIN,
    )

    rows = (
        CATALOG["daily_volume_fourier"].build(spark, SF_DIR).orderBy("k").collect()
    )
    assert [r["k"] for r in rows] == [1, 2, 3]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    from collections import Counter

    daily = Counter(e["ts"].date() for e in ev)
    d0 = min(daily)
    t_span = (max(daily) - d0).days + 1
    for r in rows:
        assert r["n_days"] == t_span
        a_num = b_num = 0
        for d, c in daily.items():
            tt = (d - d0).days
            j = ((r["k"] * tt) % t_span) * _FOURIER_PHASE_BINS // t_span
            a_num += c * _FOURIER_COS[j]
            b_num += c * _FOURIER_SIN[j]
        a, b = a_num / 1e6, b_num / 1e6
        assert abs(r["a_k"] - a) < 5.1e-5  # a_k/b_k are 4-dp rounds
        assert abs(r["b_k"] - b) < 5.1e-5
        mean = sum(daily.values()) / t_span
        assert abs(r["relative_amplitude"] - math.hypot(a, b) / mean) < 1e-4
        assert "phase" not in r.asDict()
        # grid quantization must still track the float DFT closely
        a_f = sum(
            c * math.cos(2 * math.pi * r["k"] * (d - d0).days / t_span)
            for d, c in daily.items()
        )
        b_f = sum(
            c * math.sin(2 * math.pi * r["k"] * (d - d0).days / t_span)
            for d, c in daily.items()
        )
        scale = max(sum(daily.values()) / 100.0, 1.0)
        assert abs(a - a_f) < scale and abs(b - b_f) < scale


def test_bloom_audit_invariants(spark):
    [r] = CATALOG["bloom_fpp_audit"].build(spark, SF_DIR).collect()
    assert r["false_negatives"] == 0  # a Bloom filter never lies negative
    assert r["m_bits"] == 4096 and r["k_hashes"] == 4
    assert 0 < r["bits_set"] <= min(4096, 4 * r["n_members"])
    assert 0 <= r["false_positives"] <= r["n_nonmembers"]
    assert abs(r["fpp_observed"] - r["false_positives"] / r["n_nonmembers"]) < 1e-5
    # theory formula sanity: (1 - (1-1/m)^{kn})^k
    expect = (1 - (1 - 1 / 4096) ** (4 * r["n_members"])) ** 4
    assert abs(r["fpp_theory"] - expect) < 1e-4
    # observed within a loose binomial envelope of theory (tiny n_nonmembers)
    sd = math.sqrt(max(expect * (1 - expect) / max(r["n_nonmembers"], 1), 1e-12))
    assert abs(r["fpp_observed"] - expect) < max(5 * sd, 0.05)


def test_sequential_funnel_counts_and_ordering(spark):
    rows = CATALOG["sequential_funnel_windowed"].build(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    users: dict[int, list] = {}
    for e in ev:
        users.setdefault(e["user_id"], []).append((e["ts"], e["event_type"]))
    depths: dict[int, int] = {}
    for uid, evs in users.items():
        evs.sort()
        t1 = min((t for t, k in evs if k == "view"), default=None)
        t2 = (
            min((t for t, k in evs if k == "click" and t > t1), default=None)
            if t1
            else None
        )
        t3 = (
            min((t for t, k in evs if k == "purchase" and t > t2), default=None)
            if t2
            else None
        )
        depths[uid] = 3 if t3 else 2 if t2 else 1 if t1 else 0
    from collections import Counter

    expect = Counter(depths.values())
    got = {r["depth"]: r["n_users"] for r in rows}
    assert got == dict(expect)
    for r in rows:
        assert r["n_within_window"] <= r["n_users"]
        if r["depth"] < 3:
            assert r["n_within_window"] == 0
            assert r["avg_hours_to_convert"] is None
