"""Round-11 batch: heaps_moments_probe (the anchor-sum bisect companion
for heaps_law_loglog_fit — see plans/round11.py; rewritten round 12 when
the ln() quantization left the hashed surface)."""

from __future__ import annotations

import math

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_heaps_probe_matches_python_anchor_sums(spark):
    row = CATALOG["heaps_moments_probe"].build(spark, SF_DIR).collect()[0]
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    docs.sort(key=lambda d: d["doc_id"])
    seen: set[str] = set()
    cum_t = 0
    anchors: dict[int, tuple[int, int]] = {}
    for d in docs:
        ws = d["text"].lower().split(" ")
        cum_t += len(ws)
        seen.update(ws)
        if cum_t >= 1:
            anchors[cum_t.bit_length() - 1] = (cum_t, len(seen))
    assert row["n_anchors"] == len(anchors)
    assert row["sk"] == sum(anchors)
    assert row["skk"] == sum(k * k for k in anchors)
    assert row["st"] == sum(t for t, _ in anchors.values())
    assert row["sv"] == sum(v for _, v in anchors.values())
    assert row["skv"] == sum(k * v for k, (_, v) in anchors.items())
    assert row["total_tokens"] == cum_t
    assert row["total_vocab"] == len(seen)


def test_heaps_probe_consistent_with_fit(spark):
    # the probe's sums must be exactly the column sums of the fit's
    # anchor rows — the invariant the driver-side bisect relies on
    fit = CATALOG["heaps_law_loglog_fit"].build(spark, SF_DIR).collect()
    probe = CATALOG["heaps_moments_probe"].build(spark, SF_DIR).collect()[0]
    assert probe["n_anchors"] == len(fit)
    assert probe["sk"] == sum(r["bucket"] for r in fit)
    assert probe["skk"] == sum(r["bucket"] ** 2 for r in fit)
    assert probe["st"] == sum(r["anchor_tokens"] for r in fit)
    assert probe["sv"] == sum(r["anchor_vocab"] for r in fit)
    assert probe["skv"] == sum(r["bucket"] * r["anchor_vocab"] for r in fit)
    assert {(r["total_tokens"], r["total_vocab"]) for r in fit} == {
        (probe["total_tokens"], probe["total_vocab"])
    }


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
    """Reference Gear CDC: list of (len, md5_hex) per chunk — the r12
    content-hash identity (ADVICE r11: the old polynomial moment
    signature could collide and overflow)."""
    import hashlib

    gvs = [(ord(c) * _GEAR_MULT) % 65536 for c in text]
    chunks, cur = [], []
    for i, c in enumerate(text):
        h = 0
        for d in range(_GEAR_WINDOW):
            if i - d >= 0:
                h += gvs[i - d] << d
        cur.append(c)
        if (h % _GEAR_MOD) % _CDC_MASK == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [
        (len(ch), hashlib.md5("".join(ch).encode()).hexdigest())
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
        key=lambda t: (-t[0], -t[1], t[2]),
    )[:20]
    rows = CATALOG["cdc_gear_chunk_dedup"].build(spark, SF_DIR).collect()
    got = [
        (r["n_copies"], r["chunk_len"], r["chunk_hash"], r["n_docs"])
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
