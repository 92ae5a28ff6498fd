"""Semantic properties of the round-8 continuation batch 21
(plans/round8w.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math
from collections import Counter

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def _keep(text: str) -> str:
    w = text.lower().split(" ")
    nw = len(w)
    mwl = sum(len(x) for x in w) / nw
    fdup = 1.0 - len(set(w)) / nw
    return "keep" if (25 <= nw <= 90 and 4.2 <= mwl <= 5.2 and fdup < 0.6) else "drop"


def test_cramers_v_python_recompute(spark):
    rows = {r["pair"]: r for r in
            CATALOG["cramers_v_matrix"].build(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    facets = [
        {
            "lang": d["lang"],
            "source": d["source"],
            "len_bucket": str(d["n_chars"] // 100),
            "keep": _keep(d["text"]),
        }
        for d in docs
    ]
    pairs = [
        ("lang|source", "lang", "source"),
        ("lang|len_bucket", "lang", "len_bucket"),
        ("lang|keep", "lang", "keep"),
        ("source|len_bucket", "source", "len_bucket"),
        ("source|keep", "source", "keep"),
        ("len_bucket|keep", "len_bucket", "keep"),
    ]
    assert set(rows) == {p for p, _, _ in pairs}
    n = len(facets)
    for pname, xa, xb in pairs:
        cells: Counter = Counter((f[xa], f[xb]) for f in facets)
        ma: Counter = Counter()
        mb: Counter = Counter()
        for (a, b), o in cells.items():
            ma[a] += o
            mb[b] += o
        chi2 = sum(o * o * n / (ma[a] * mb[b]) for (a, b), o in cells.items()) - n
        r, c = len(ma), len(mb)
        v = math.sqrt(chi2 / (n * (min(r, c) - 1)))
        got = rows[pname]
        assert got["n"] == n
        assert got["n_rows"] == r and got["n_cols"] == c
        assert abs(got["chi2"] - chi2) < 1e-2
        assert abs(got["cramers_v"] - v) < 1e-3
        assert -1e-9 <= got["cramers_v"] <= 1.0 + 1e-9


def test_esd_rounds_recompute_and_unmasking(spark):
    rows = sorted(
        CATALOG["esd_outlier_rounds"].build(spark, SF_DIR).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == [1, 2, 3]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily: dict = {}
    for e in ev:
        d = e["ts"].date().isoformat()
        daily[d] = daily.get(d, 0) + int(round(e["value"] * 100))
    remaining = dict(daily)
    for r in rows:
        vals = list(remaining.values())
        n = len(vals)
        mean = sum(vals) / n
        sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
        best = max(
            remaining.items(),
            key=lambda kv: (round(abs(kv[1] - mean) / sd, 6), ),
        )
        cands = [
            (d, v)
            for d, v in remaining.items()
            if round(abs(v - mean) / sd, 6) == round(abs(best[1] - mean) / sd, 6)
        ]
        day = min(cands)[0]  # day tiebreak
        assert r["day"] == day
        assert r["n_at_test"] == n
        assert abs(r["r_stat"] - round(abs(remaining[day] - mean) / sd, 6)) < 1e-9
        assert abs(r["value"] - round(remaining[day] / 100.0, 2)) < 1e-9
        del remaining[day]
    # extracted days are distinct
    assert len({r["day"] for r in rows}) == 3
