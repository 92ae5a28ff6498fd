"""Round-10 batch 3: chrF adjacent-pair corpus diversity — full Python
recompute (char n-gram counting, clipped overlap, integer F and means)
against the Spark plan; oracle parity is covered by preflight.py."""

from __future__ import annotations

import math
from collections import Counter

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"
_MAX_N = 6


def _half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


def _grams(c: str, n: int) -> Counter:
    return Counter(c[i : i + n] for i in range(len(c) - n + 1))


def _reference(spark):
    docs = sorted(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect(),
        key=lambda r: r["doc_id"],
    )
    by_src: dict = {}
    for d in docs:
        by_src.setdefault(d["source"], []).append(
            (d["doc_id"], d["text"].lower().replace(" ", ""))
        )
    out: dict = {}
    for src, rows in by_src.items():
        chrfs = []
        for (_, ref), (_, hyp) in zip(rows, rows[1:]):
            fsum = 0
            for n in range(1, _MAX_N + 1):
                hg, rg = _grams(hyp, n), _grams(ref, n)
                th = max(len(hyp) - n + 1, 0)
                tr = max(len(ref) - n + 1, 0)
                if 4 * tr + th == 0:
                    continue  # f_micro = 0 for orders longer than both docs
                o = sum(min(c, rg[g]) for g, c in hg.items())
                fsum += _half_up(5.0 * o * 1e6 / (4 * tr + th))
            chrfs.append(fsum // _MAX_N)
        if chrfs:
            out[src] = {
                "n_pairs": len(chrfs),
                "mean_chrf_micro": sum(chrfs) // len(chrfs),
                "min_chrf_micro": min(chrfs),
                "max_chrf_micro": max(chrfs),
            }
    return out


def test_chrf_python_recompute(spark):
    rows = {
        r["source"]: r
        for r in CATALOG["chrf_adjacent_doc_pairs"].build(spark, SF_DIR).collect()
    }
    ref = _reference(spark)
    assert set(rows) == set(ref)
    for src, want in ref.items():
        got = rows[src]
        for k, v in want.items():
            assert got[k] == v, (src, k, got[k], v)


def test_chrf_bounds(spark):
    for r in CATALOG["chrf_adjacent_doc_pairs"].build(spark, SF_DIR).collect():
        # chrF in [0, 1] scaled to micro units
        assert 0 <= r["min_chrf_micro"] <= r["mean_chrf_micro"]
        assert r["mean_chrf_micro"] <= r["max_chrf_micro"] <= 1_000_000
        assert r["n_pairs"] >= 1
