"""Perceptual image hash (plans/round10d.py, multimodal_image_phash_buckets)
— full Python recompute of
the decode -> quantized 2D DCT -> sign-pack chain against the Spark
plan; oracle parity is covered by preflight.py."""

from __future__ import annotations

import math
from collections import Counter

from citibike_deep_dive_spark.plans import CATALOG
from citibike_deep_dive_spark.plans.round10 import _PNG_H_MOD, _PNG_W_MOD

SF_DIR = "/root/testdata/sf0.001"


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _lum(mid: int, idx: int) -> int:
    def chan(c: int) -> int:
        return ((((mid % 100003) * 8191 + idx * 131 + c * 31 + 19) % 65536)
                * 25173 + 13849) % 65536 % 256

    return chan(0) + 2 * chan(1) + 3 * chan(2)


def _phash(mid: int):
    w = mid % _PNG_W_MOD + 1
    h = mid % _PNG_H_MOD + 1
    if w * h == 1:
        return w, h, 0  # no non-DC coefficient: degenerate phash=0 row
    ph = 0
    for u in range(w):
        for v in range(h):
            if u == 0 and v == 0:
                continue
            c = 0
            for idx in range(w * h):
                x, y = idx % w, idx // w
                qx = _half_away(math.cos(math.pi * (2 * x + 1) * u / (2 * w)) * 1e6)
                qy = _half_away(math.cos(math.pi * (2 * y + 1) * v / (2 * h)) * 1e6)
                c += _lum(mid, idx) * qx * qy
            if c > 0:
                ph |= 1 << (v * w + u)
    return w, h, ph


def test_phash_python_recompute(spark):
    rows = {
        r["media_id"]: r
        for r in CATALOG["multimodal_image_phash_buckets"]
        .build(spark, SF_DIR)
        .collect()
    }
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    # media grain: EVERY image emits a row; DC-only (1x1) images land
    # in the degenerate phash=0 bucket instead of being dropped
    assert len(rows) == n_docs
    one_by_one = [m for m in range(n_docs)
                  if m % _PNG_W_MOD == 0 and m % _PNG_H_MOD == 0]
    assert one_by_one and all(rows[m]["phash"] == 0 for m in one_by_one)
    buckets = Counter(r["phash"] for r in rows.values())
    for mid in sorted(rows)[:10] + one_by_one[:3]:
        w, h, ph = _phash(mid)
        r = rows[mid]
        assert (r["width"], r["height"], r["phash"]) == (w, h, ph)
        assert r["n_bucket"] == buckets[ph]


def test_phash_gain_invariance_property(spark):
    # the defining pHash property: scaling brightness preserves the
    # hash, because coefficient SIGNS survive a positive gain
    import numpy as np

    from citibike_deep_dive_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    def phash_of(px):
        h, w, _ = px.shape
        lum = (
            px[:, :, 0].astype(np.int64)
            + 2 * px[:, :, 1].astype(np.int64)
            + 3 * px[:, :, 2].astype(np.int64)
        ).reshape(-1)
        ph = 0
        for u in range(w):
            for v in range(h):
                if u == v == 0:
                    continue
                c = 0
                for idx in range(w * h):
                    x, y = idx % w, idx // w
                    qx = _half_away(
                        math.cos(math.pi * (2 * x + 1) * u / (2 * w)) * 1e6
                    )
                    qy = _half_away(
                        math.cos(math.pi * (2 * y + 1) * v / (2 * h)) * 1e6
                    )
                    c += int(lum[idx]) * qx * qy
                if c > 0:
                    ph |= 1 << (v * w + u)
        return ph

    rng = np.random.RandomState(7)
    # even values so the //2 dim is an EXACT gain (no per-pixel rounding
    # that could flip a near-zero coefficient's sign)
    px = (rng.randint(5, 60, size=(4, 5, 3)) * 2).astype(np.uint8)
    dimmed = (px.astype(np.int64) // 2).astype(np.uint8)
    # roundtrip through the real codec, then compare hashes
    a = phash_of(decode_png_pixels(encode_png(px)))
    b = phash_of(decode_png_pixels(encode_png((px.astype(np.int64) * 2)
                                              .clip(0, 255).astype(np.uint8))))
    c = phash_of(decode_png_pixels(encode_png(dimmed)))
    assert a == b == c
