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


# ---------------------------------------------------------------------------
# cdc_gear_chunk_dedup — Python reference recompute + shift resistance
# ---------------------------------------------------------------------------

from citibike_deep_dive_spark.plans.round11 import (  # noqa: E402
    _CDC_MASK,
    _GEAR_MOD,
    _GEAR_MULT,
    _GEAR_WINDOW,
)


def _chunks_of(text: str):
    """Reference Gear CDC: list of (len, sig1, sig2) per chunk."""
    gvs = [(ord(c) * _GEAR_MULT) % 65536 for c in text]
    chunks, cur = [], []
    for i, c in enumerate(text):
        h = 0
        for d in range(_GEAR_WINDOW):
            if i - d >= 0:
                h += gvs[i - d] << d
        cur.append(ord(c))
        if (h % _GEAR_MOD) % _CDC_MASK == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [
        (
            len(ch),
            sum(a * (j + 1) for j, a in enumerate(ch)),
            sum(a * (j + 1) * (j + 1) for j, a in enumerate(ch)),
        )
        for ch in chunks
    ]


def test_cdc_python_recompute(spark):
    from collections import Counter

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    sig_copies: Counter = Counter()
    sig_docs: dict[tuple, set] = {}
    for d in docs:
        for sig in _chunks_of(d["text"]):
            sig_copies[sig] += 1
            sig_docs.setdefault(sig, set()).add(d["doc_id"])
    expected = sorted(
        (
            (n, *sig, len(sig_docs[sig]))
            for sig, n in sig_copies.items()
        ),
        key=lambda t: (-t[0], -t[1], t[2], t[3]),
    )[:20]
    rows = CATALOG["cdc_gear_chunk_dedup"].build(spark, SF_DIR).collect()
    got = [
        (r["n_copies"], r["chunk_len"], r["sig1"], r["sig2"], r["n_docs"])
        for r in rows
    ]
    assert got == expected
    assert expected[0][0] > 1  # the corpus genuinely shares chunks


def test_cdc_shift_resistance():
    # the defining CDC property: a 1-char insertion near the head
    # changes only the chunks that overlap the edit + hash window;
    # the tail re-synchronizes (fixed-size chunking would shift every
    # boundary downstream)
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill and the rain keeps falling "
        "softly on the old tin roof of the quiet farmhouse all night"
    ) * 3
    shifted = base[:7] + "X" + base[7:]
    a = _chunks_of(base)
    b = _chunks_of(shifted)
    from collections import Counter

    shared = sum((Counter(a) & Counter(b)).values())  # multiset overlap
    assert shared >= max(len(a), len(b)) - 2
    assert a[-1] == b[-1]  # tail chunks identical after re-sync
