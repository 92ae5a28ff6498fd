"""WAV spectral features (plans/round10.py, multimodal_wav_spectral_features)
— full Python recompute of
the decode -> micro-quantized DFT -> feature chain against the Spark
plan; oracle parity is covered by preflight.py."""

from __future__ import annotations

import math

from citibike_deep_dive_spark.plans import CATALOG
from citibike_deep_dive_spark.plans.round10 import (
    _TWO_PI,
    _WAV_N_BASE,
    _WAV_N_MOD,
)

SF_DIR = "/root/testdata/sf0.001"


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _features(mid: int):
    n = mid % _WAV_N_MOD + _WAV_N_BASE
    s = [
        ((mid % 99991) * 6007 + idx * 193 + 11) % 65536 - 32768
        for idx in range(n)
    ]
    ps = {}
    for k in range(1, n // 2 + 1):
        re = sum(
            s[t] * _half_away(math.cos(_TWO_PI * ((k * t) % n) / n) * 1e6)
            for t in range(n)
        )
        im = sum(
            s[t] * _half_away(math.sin(_TWO_PI * ((k * t) % n) / n) * 1e6)
            for t in range(n)
        )
        ps[k] = re * re + im * im
    tot = sum(ps.values())
    skp = sum(k * p for k, p in ps.items())
    pmax = max(ps.values())
    low = sum(p for k, p in ps.items() if k <= n // 8)
    return {
        "n_bins": n // 2,
        # engines cast the exact integer sums to double BEFORE dividing
        # (sums exceed 2^53) — mirror that with float() conversions
        "spectral_centroid_micro": _half_away(float(skp) / float(tot) * 1e6)
        if tot
        else 0,
        "dominant_bin": min(k for k, p in ps.items() if p == pmax),
        "dominant_power_str": str(pmax),
        "low_band_ratio_micro": _half_away(float(low) / float(tot) * 1e6)
        if tot
        else 0,
    }


def test_wav_spectral_python_recompute(spark):
    rows = {
        r["media_id"]: r
        for r in CATALOG["multimodal_wav_spectral_features"]
        .build(spark, SF_DIR)
        .collect()
    }
    assert len(rows) >= 10
    for mid in sorted(rows)[:8]:
        want = _features(mid)
        got = rows[mid]
        for key, val in want.items():
            assert got[key] == val, (mid, key, got[key], val)


def test_wav_spectral_invariants(spark):
    for r in (
        CATALOG["multimodal_wav_spectral_features"].build(spark, SF_DIR).collect()
    ):
        assert 1 <= r["dominant_bin"] <= r["n_bins"]
        # centroid lies inside the bin range (micro units)
        assert 1_000_000 <= r["spectral_centroid_micro"] <= r["n_bins"] * 1_000_000
        assert 0 <= r["low_band_ratio_micro"] <= 1_000_000
