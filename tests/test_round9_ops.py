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


def test_triplet_semihard_python_recompute(spark):
    import math

    out = {
        r["anchor_id"]: r
        for r in CATALOG["triplet_semihard_mining"].build(spark, SF_DIR).collect()
    }
    embs = {
        r["vec_id"]: (r["label"], [float(x) for x in r["embedding"]])
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 4)

    for aid in list(out)[:5]:
        ql, qv = embs[aid]
        sims = [
            (cos(v, qv), vid, lab)
            for vid, (lab, v) in embs.items()
            if vid != aid
        ]
        pos = max(
            ((s, -vid) for s, vid, lab in sims if lab == ql),
        )
        cos_pos, pos_id = pos[0], -pos[1]
        negs = [
            (s, -vid) for s, vid, lab in sims if lab != ql and s < cos_pos
        ]
        cos_neg, neg_id = max(negs)[0], -max(negs)[1]
        r = out[aid]
        assert (r["pos_id"], r["cos_pos"]) == (pos_id, cos_pos)
        assert (r["neg_id"], r["cos_neg"]) == (neg_id, cos_neg)
        assert r["margin_active"] == int(cos_neg > cos_pos - 0.05)
    # semi-hard invariant: every negative is strictly farther than the
    # positive, and anchors without one are absent (inner join)
    for r in out.values():
        assert r["cos_neg"] < r["cos_pos"]


def test_neyman_allocation_properties(spark):
    import statistics

    rows = (
        CATALOG["neyman_stratified_allocation"].build(spark, SF_DIR).collect()
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "source", "n_chars"
    ).collect()
    by_src: dict = {}
    for d in docs:
        by_src.setdefault(d["source"], []).append(d["n_chars"])
    assert {r["source"] for r in rows} == set(by_src)
    n_total = sum(len(v) for v in by_src.values())
    s_mu = {
        s: int((statistics.stdev(v)) * 1e6 + 0.5) for s, v in by_src.items()
    }
    tot_ns = sum(len(by_src[s]) * s_mu[s] for s in by_src)
    for r in rows:
        v = by_src[r["source"]]
        assert r["n_docs"] == len(v)
        assert abs(r["stddev_chars"] - statistics.stdev(v)) < 1e-3
        assert r["alloc_prop"] == int(1000.0 * len(v) / n_total + 0.5)
        assert r["alloc_neyman"] == int(
            1000.0 * len(v) * s_mu[r["source"]] / tot_ns + 0.5
        )
    # both schemes allocate ~n in total (off by rounding only)
    assert abs(sum(r["alloc_prop"] for r in rows) - 1000) <= len(rows)
    assert abs(sum(r["alloc_neyman"] for r in rows) - 1000) <= len(rows)


def test_boilerplate_flags_python_recompute(spark):
    out = {
        r["doc_id"]: r
        for r in CATALOG["boilerplate_ngram_flags"].build(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    ).collect()
    assert len(out) == len(docs)
    from collections import defaultdict

    grams_of = {}
    src_docs = defaultdict(int)
    df = defaultdict(int)
    for d in docs:
        w = d["text"].split(" ")
        gs = [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
        grams_of[d["doc_id"]] = (d["source"], gs)
        src_docs[d["source"]] += 1
        for g in set(gs):
            df[(d["source"], g)] += 1
    boiler = {k for k, v in df.items() if 5 * v >= src_docs[k[0]]}
    for d in docs[:40]:
        src, gs = grams_of[d["doc_id"]]
        nb = sum(1 for g in gs if (src, g) in boiler)
        r = out[d["doc_id"]]
        assert r["n_pos"] == len(gs)
        assert r["n_boiler"] == nb
        if gs:
            assert r["boiler_frac"] == round(nb / len(gs), 5)
