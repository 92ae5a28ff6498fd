"""Semantic properties of the round-8 continuation batch 20
(plans/round8v.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def _lengths(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    xa = [d["n_chars"] for d in docs if d["source"] == "src0"]
    xb = [d["n_chars"] for d in docs if d["source"] == "src1"]
    return xa, xb


def test_energy_distance_python_recompute(spark):
    rows = CATALOG["energy_distance_sources"].build(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    xa, xb = _lengths(spark)
    assert r["n_a"] == len(xa) and r["n_b"] == len(xb)
    e_xy = sum(abs(a - b) for a in xa for b in xb) / (len(xa) * len(xb))
    e_xx = sum(abs(a - b) for a in xa for b in xa) / (len(xa) ** 2)
    e_yy = sum(abs(a - b) for a in xb for b in xb) / (len(xb) ** 2)
    assert abs(r["e_xy"] - e_xy) < 1e-3
    assert abs(r["e_xx"] - e_xx) < 1e-3
    assert abs(r["e_yy"] - e_yy) < 1e-3
    ed = 2 * e_xy - e_xx - e_yy
    assert abs(r["energy_distance"] - ed) < 1e-2
    assert r["energy_distance"] >= -1e-9  # energy distance is nonnegative


def test_mmd_python_recompute_and_bounds(spark):
    rows = CATALOG["mmd_rbf_sources"].build(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    xa, xb = _lengths(spark)
    bw = 100.0

    def k(a, b):
        return round(1e9 * math.exp(-((a - b) ** 2) / (2 * bw * bw))) / 1e9

    k_xx = sum(k(a, b) for a in xa for b in xa) / (len(xa) ** 2)
    k_yy = sum(k(a, b) for a in xb for b in xb) / (len(xb) ** 2)
    k_xy = sum(k(a, b) for a in xa for b in xb) / (len(xa) * len(xb))
    assert abs(r["k_xx"] - k_xx) < 1e-4
    assert abs(r["k_yy"] - k_yy) < 1e-4
    assert abs(r["k_xy"] - k_xy) < 1e-4
    mmd2 = k_xx + k_yy - 2 * k_xy
    assert abs(r["mmd2"] - mmd2) < 1e-4
    # biased V-statistic MMD^2 is nonnegative; kernel means are in (0, 1]
    assert r["mmd2"] >= -1e-9
    for c in ("k_xx", "k_yy", "k_xy"):
        assert 0.0 < r[c] <= 1.0
