"""Round-10 batch 2: unigram-LM Viterbi segmentation — full Python
recompute of the algorithm (piece scoring + packed-integer DP) against
the Spark plan; oracle parity is covered by preflight.py."""

from __future__ import annotations

import math

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"

_MAX_WLEN = 9
_MAX_PIECE = 3


def _half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


def _reference(spark):
    """Pure-Python unigram-LM scoring + Viterbi over the same corpus."""
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .collect()
    ]
    wcount: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split(" "):
            if w and len(w) <= _MAX_WLEN:
                wcount[w] = wcount.get(w, 0) + 1
    cnt: dict[str, int] = {}
    for w, c in wcount.items():
        for i in range(len(w)):
            for k in range(1, _MAX_PIECE + 1):
                if i + k <= len(w):
                    p = w[i : i + k]
                    cnt[p] = cnt.get(p, 0) + c
    tot = sum(cnt.values())
    score = {p: _half_up(math.log(tot / c) * 1e6) for p, c in cnt.items()}

    def viterbi(w: str) -> int:
        best: list[int | None] = [0] + [None] * len(w)
        for j in range(1, len(w) + 1):
            cands = [
                best[j - k] + score[w[j - k : j]] * 100 + 1
                for k in range(1, _MAX_PIECE + 1)
                if j - k >= 0
            ]
            best[j] = min(cands)
        return best[len(w)]

    return wcount, viterbi


def test_unigram_viterbi_python_recompute(spark):
    rows = CATALOG["unigram_lm_viterbi_segments"].build(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 50
    wcount, viterbi = _reference(spark)
    # top-50 selection matches (wcount DESC, word) on the python counts
    expect = sorted(wcount.items(), key=lambda t: (-t[1], t[0]))[: len(rows)]
    assert [(r["word"], r["wcount"]) for r in rows] == expect
    for r in rows:
        packed = viterbi(r["word"])
        assert r["n_pieces"] == packed % 100
        assert r["cost_micro"] == (packed - packed % 100) // 100
        assert r["word_len"] == len(r["word"])
        assert r["fertility_micro"] == _half_up(
            (packed % 100) * 1e6 / len(r["word"])
        )


def test_unigram_viterbi_invariants(spark):
    rows = CATALOG["unigram_lm_viterbi_segments"].build(spark, SF_DIR).collect()
    for r in rows:
        # piece count bounded by ceil(len/3) .. len
        assert math.ceil(r["word_len"] / _MAX_PIECE) <= r["n_pieces"] <= r["word_len"]
        assert r["cost_micro"] >= 0
        # packed encoding is carry-free: n_pieces < 100 by construction
        assert r["n_pieces"] < 100
