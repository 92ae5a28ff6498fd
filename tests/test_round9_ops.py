"""Round-9 batch 1: the real BMP codec (operators/multimodal.py) and
the cross-engine pixel-stats query (plans/round9.py); oracle parity is
covered by preflight.py — here the codec is pinned against numpy
directly, including the format traps (stride padding, bottom-up rows,
BGR order, 32bpp, truncation)."""

from __future__ import annotations

import numpy as np

from citibike_deep_dive_spark.operators.multimodal import (
    _bmp_features,
    decode_bmp_pixels,
    encode_bmp,
    extract_features,
    parse_image_dimensions,
)
from citibike_deep_dive_spark.plans import CATALOG
from citibike_deep_dive_spark.plans.round9 import _pixel_value

SF_DIR = "/root/testdata/sf0.001"


def _random_px(h, w, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip_every_stride_padding():
    # widths 1..8 cover all four (w*3) % 4 padding cases twice
    for w in range(1, 9):
        for h in (1, 3, 5):
            px = _random_px(h, w, seed=w * 10 + h)
            out = decode_bmp_pixels(encode_bmp(px))
            assert out is not None and out.shape == (h, w, 3)
            np.testing.assert_array_equal(out, px)


def test_bmp_roundtrip_top_down():
    px = _random_px(4, 5, seed=7)
    np.testing.assert_array_equal(
        decode_bmp_pixels(encode_bmp(px, top_down=True)), px
    )
    # the two storage orders produce different FILES but the same image
    assert encode_bmp(px) != encode_bmp(px, top_down=True)


def test_bmp_header_matches_parse_image_dimensions():
    payload = encode_bmp(_random_px(6, 3, seed=1))
    assert parse_image_dimensions(payload) == ("bmp", 3, 6)


def test_bmp_decode_32bpp():
    # hand-build a 32bpp top-down 1x2 image: BGRA BGRA, no padding needed
    w, h = 2, 1
    header = (
        b"BM"
        + (54 + 8).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + (-h & 0xFFFFFFFF).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (32).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + (8).to_bytes(4, "little")
        + b"\x00" * 16
    )
    body = bytes([10, 20, 30, 255, 40, 50, 60, 255])  # B G R A x2
    out = decode_bmp_pixels(header + body)
    np.testing.assert_array_equal(out, [[[30, 20, 10], [60, 50, 40]]])


def test_bmp_decode_rejects_garbage():
    px = _random_px(3, 3, seed=2)
    good = encode_bmp(px)
    assert decode_bmp_pixels(good[:-1]) is None  # truncated body
    assert decode_bmp_pixels(b"BM" + good[2:40]) is None  # truncated header
    assert decode_bmp_pixels(b"not a bitmap at all") is None
    # compressed flag set -> refused (would need a real codec)
    bad = bytearray(good)
    bad[30] = 1  # BI_RLE8
    assert decode_bmp_pixels(bytes(bad)) is None
    # utf-8 text can never masquerade as a BMP (header needs NUL bytes)
    assert decode_bmp_pixels("BM plain text payload far far far longer "
                             "than fifty-four bytes of header".encode()) is None


def test_extract_features_real_path_for_bmp(spark):
    px = _random_px(4, 4, seed=3)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(encode_bmp(px)), 4, 4, 0),
            (2, "audio", bytearray(b"not decodable"), 0, 0, 1000),
        ],
        "media_id long, kind string, payload binary, meta_width int, "
        "meta_height int, meta_duration_ms int",
    )
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows[1]["features"] == _bmp_features(px)  # REAL pixel features
    assert len(rows[2]["features"]) == 8  # stub fallback still works


def test_bmp_pixel_stats_python_recompute(spark):
    out = {
        r["media_id"]: r
        for r in CATALOG["multimodal_bmp_pixel_stats"].build(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id").collect()
    assert len(out) == len(docs)
    for d in docs[:25]:
        mid = d["doc_id"]
        w, h = mid % 7 + 1, mid % 5 + 1
        vals = [
            [_pixel_value(mid, i, c) for c in (0, 1, 2)] for i in range(w * h)
        ]
        lum = [r + 2 * g + 3 * b for r, g, b in vals]
        r = out[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_r"] == sum(v[0] for v in vals) / (w * h)
        assert (r["min_lum"], r["max_lum"]) == (min(lum), max(lum))
        assert r["poschk"] == sum((i + 1) * l for i, l in enumerate(lum))
