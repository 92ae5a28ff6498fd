"""Round-11 batch: heaps_moments_probe (the driver-side bisect probe for
heaps_law_loglog_fit — see plans/round11.py)."""

from __future__ import annotations

import math

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_heaps_probe_matches_python_moments(spark):
    row = CATALOG["heaps_moments_probe"].build(spark, SF_DIR).collect()[0]
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    docs.sort(key=lambda d: d["doc_id"])
    seen: set[str] = set()
    cum_t = 0
    pts = []
    for d in docs:
        ws = d["text"].lower().split(" ")
        cum_t += len(ws)
        seen.update(ws)
        pts.append(
            (round(math.log(cum_t) * 1e6), round(math.log(len(seen)) * 1e6))
        )
    assert row["n_points"] == len(pts)
    assert row["sx"] == sum(x for x, _ in pts)
    assert row["sy"] == sum(y for _, y in pts)
    assert row["sxx"] == sum(x * x for x, _ in pts)
    assert row["sxy"] == sum(x * y for x, y in pts)
    assert row["total_tokens"] == cum_t
    assert row["total_vocab"] == len(seen)


def test_heaps_probe_consistent_with_fit(spark):
    # fit outputs must be exactly the integer long division of the
    # probe's moments — the invariant the driver-side bisect relies on
    probe = CATALOG["heaps_moments_probe"].build(spark, SF_DIR).collect()[0]
    fit = CATALOG["heaps_law_loglog_fit"].build(spark, SF_DIR).collect()[0]
    np_, sx, sy = probe["n_points"], probe["sx"], probe["sy"]
    num = np_ * probe["sxy"] - sx * sy
    den = np_ * probe["sxx"] - sx * sx

    def intdiv_round(a: int, b: int) -> int:
        s = -1 if a < 0 else 1
        return s * ((2 * abs(a) + b) // (2 * b))

    assert fit["n_points"] == np_
    assert fit["heaps_beta_micro"] == intdiv_round(1_000_000 * num, den)
    assert fit["heaps_lnk_micro"] == intdiv_round(sy * den - num * sx, np_ * den)
