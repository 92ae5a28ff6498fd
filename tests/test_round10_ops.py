"""Round-10: the real PNG pixel codec and WAV PCM codec
(operators/multimodal.py), the two cross-engine stats queries
(plans/round10.py), the heaps_law_loglog_fit micro-unit rewrite, and
regression tests for the two round-9 ADVICE fixes (short-doc
boilerplate fan-out, single-document Neyman stratum). Oracle parity is
covered by preflight.py — here the codecs are pinned against numpy /
hand-built byte streams, including an EXTERNALLY generated (libpng)
fixture so a shared encoder+decoder misreading of the spec cannot
roundtrip its way past the suite."""

from __future__ import annotations

import base64
import math
import zlib

import numpy as np

from citibike_deep_dive_spark.operators.multimodal import (
    _bmp_features,
    decode_png_pixels,
    decode_wav_samples,
    encode_png,
    encode_wav,
    extract_features,
    parse_image_dimensions,
)
from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"

# 1x1 red RGBA PNG produced by libpng (widely published sample) — an
# encoder-independent ground truth for the decode path.
_LIBPNG_RED_1X1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


def _random_px(h, w, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + zlib.crc32(tag + body).to_bytes(4, "big")
    )


def _raw_png(w, h, bit_depth, color_type, interlace, scanlines: bytes) -> bytes:
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([bit_depth, color_type, 0, 0, interlace])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanlines))
        + _png_chunk(b"IEND", b"")
    )


def test_png_roundtrip_every_filter_and_width():
    # h >= 5 exercises ALL five scanline filters (encode uses y % 5);
    # widths 1..8 vary the left-pixel reach of Sub/Average/Paeth.
    for w in range(1, 9):
        for h in (1, 2, 5, 7):
            px = _random_px(h, w, seed=w * 10 + h)
            out = decode_png_pixels(encode_png(px))
            assert out is not None and out.shape == (h, w, 3)
            np.testing.assert_array_equal(out, px)


def test_png_decodes_external_libpng_fixture():
    out = decode_png_pixels(_LIBPNG_RED_1X1)
    np.testing.assert_array_equal(out, [[[255, 0, 0]]])


def test_png_header_matches_parse_image_dimensions():
    payload = encode_png(_random_px(6, 3, seed=1))
    assert parse_image_dimensions(payload) == ("png", 3, 6)


def test_png_decode_rgba_drops_alpha():
    # hand-built color-type-6 image, filter 0 rows: 1x2 RGBA
    scan = bytes([0, 10, 20, 30, 255, 40, 50, 60, 128])
    out = decode_png_pixels(_raw_png(2, 1, 8, 6, 0, scan))
    np.testing.assert_array_equal(out, [[[10, 20, 30], [40, 50, 60]]])


def test_png_decode_multi_idat():
    # split the compressed stream across two IDAT chunks (legal per spec)
    px = _random_px(5, 4, seed=9)
    blob = encode_png(px)
    # re-chunk: find the single IDAT and split its body in two
    i = 8
    parts = []
    while i < len(blob):
        ln = int.from_bytes(blob[i : i + 4], "big")
        tag = blob[i + 4 : i + 8]
        body = blob[i + 8 : i + 8 + ln]
        if tag == b"IDAT":
            parts.append(_png_chunk(b"IDAT", body[: ln // 2]))
            parts.append(_png_chunk(b"IDAT", body[ln // 2 :]))
        else:
            parts.append(blob[i : i + 12 + ln])
        i += 12 + ln
    np.testing.assert_array_equal(decode_png_pixels(blob[:8] + b"".join(parts)), px)


def test_png_decode_rejects_uncovered_variants():
    px = _random_px(2, 2, seed=3)
    good = encode_png(px)
    assert decode_png_pixels(good[: len(good) // 2]) is None  # truncated mid-IDAT
    assert decode_png_pixels(b"not a png") is None
    scan = bytes([0, 1, 2, 3, 4, 5, 6])
    assert decode_png_pixels(_raw_png(2, 1, 8, 3, 0, scan)) is None  # palette
    assert decode_png_pixels(_raw_png(2, 1, 16, 2, 0, scan)) is None  # 16-bit
    assert decode_png_pixels(_raw_png(2, 1, 8, 2, 1, scan)) is None  # interlaced
    # corrupt filter byte (type 9) on an otherwise valid stream
    bad = bytes([9, 1, 2, 3, 4, 5, 6])
    assert decode_png_pixels(_raw_png(2, 1, 8, 2, 0, bad)) is None
    # wrong scanline length (missing final byte)
    assert decode_png_pixels(_raw_png(2, 1, 8, 2, 0, scan[:-1])) is None


def test_wav_roundtrip_rates_and_lengths():
    rng = np.random.RandomState(11)
    for n, rate in [(1, 8000), (20, 16000), (69, 24000), (500, 44100)]:
        s = rng.randint(-32768, 32768, size=n).astype(np.int16)
        dec = decode_wav_samples(encode_wav(s, rate))
        assert dec is not None
        back, r2, nch = dec
        assert (r2, nch) == (rate, 1)
        np.testing.assert_array_equal(back, s)


def test_wav_chunk_walk_skips_odd_padded_chunks():
    # a LIST chunk with an ODD body length before data: the walker must
    # honor RIFF word alignment (pad byte) to land on the data chunk
    s = np.array([100, -200, 300], dtype=np.int16)
    blob = encode_wav(s, 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    patched = blob[:fmt_end] + extra + blob[fmt_end:]
    patched = (
        patched[:4]
        + (len(patched) - 8).to_bytes(4, "little")
        + patched[8:]
    )
    dec = decode_wav_samples(patched)
    assert dec is not None
    np.testing.assert_array_equal(dec[0], s)


def test_wav_decode_rejects_non_pcm():
    s = np.zeros(4, dtype=np.int16)
    blob = bytearray(encode_wav(s, 8000))
    assert decode_wav_samples(bytes(blob[:-1])) is None  # truncated data
    blob[20:22] = (3).to_bytes(2, "little")  # IEEE-float format tag
    assert decode_wav_samples(bytes(blob)) is None
    blob[20:22] = (1).to_bytes(2, "little")
    blob[34:36] = (8).to_bytes(2, "little")  # 8-bit PCM not covered
    assert decode_wav_samples(bytes(blob)) is None
    assert decode_wav_samples(b"RIFFxxxxWAVE") is None
    assert decode_wav_samples(b"mp3 junk") is None


def test_extract_features_real_path_for_png(spark):
    px = _random_px(4, 4, seed=5)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(encode_png(px)), 4, 4, 0),
            (2, "audio", bytearray(b"not decodable"), 0, 0, 1000),
        ],
        "media_id long, kind string, payload binary, meta_width int, "
        "meta_height int, meta_duration_ms int",
    )
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows[1]["features"] == _bmp_features(px)  # REAL pixel features
    assert len(rows[2]["features"]) == 8  # stub fallback still works


def _png_pixel_value(media_id: int, idx: int, c: int) -> int:
    return (
        (((media_id % 100003) * 8191 + idx * 131 + c * 31 + 19) % 65536) * 25173
        + 13849
    ) % 65536 % 256


def test_png_pixel_stats_python_recompute(spark):
    out = {
        r["media_id"]: r
        for r in CATALOG["multimodal_png_pixel_stats"].build(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id").collect()
    assert len(out) == len(docs)
    for d in docs[:25]:
        mid = d["doc_id"]
        w, h = mid % 6 + 1, mid % 5 + 1
        vals = [
            [_png_pixel_value(mid, i, c) for c in (0, 1, 2)] for i in range(w * h)
        ]
        lum = [r + 2 * g + 3 * b for r, g, b in vals]
        r = out[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_r"] == sum(v[0] for v in vals) / (w * h)
        assert (r["min_lum"], r["max_lum"]) == (min(lum), max(lum))
        assert r["poschk"] == sum((i + 1) * l for i, l in enumerate(lum))


def test_wav_audio_stats_python_recompute(spark):
    out = {
        r["media_id"]: r
        for r in CATALOG["multimodal_wav_audio_stats"].build(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id").collect()
    assert len(out) == len(docs)
    for d in docs[:25]:
        mid = d["doc_id"]
        n = mid % 50 + 20
        rate = 8000 * (mid % 3 + 1)
        s = [((mid % 99991) * 6007 + i * 193 + 11) % 65536 - 32768 for i in range(n)]
        r = out[mid]
        assert (r["n_samples"], r["sample_rate"]) == (n, rate)
        assert r["duration_ms"] == n * 1000 // rate
        assert r["mean_amp"] == sum(s) / n
        assert (r["min_amp"], r["max_amp"]) == (min(s), max(s))
        assert r["zero_cross"] == sum(
            1 for i in range(1, n) if (s[i - 1] < 0) != (s[i] < 0)
        )
        assert r["poschk"] == sum((i + 1) * v for i, v in enumerate(s))


def test_heaps_anchor_buckets_exact_at_power_of_two_boundaries(spark, tmp_path):
    # r12 rewrite: the hashed surface is integer doubling-grid anchors;
    # the floor(log2)+shift-correction bucket must be EXACT at and
    # around power-of-2 token counts (the boundary where libm log2 is
    # allowed to be a ulp off). Build a corpus whose cumulative token
    # curve hits 2^k exactly and 2^k ± 1.
    rows = []
    cum = 0
    did = 0
    for target in [1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 31, 32, 64, 100]:
        nt = target - cum
        if nt <= 0:
            continue
        rows.append((did, " ".join(f"w{did}_{i}" for i in range(nt)), "en", "s", 1))
        cum = target
        did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = CATALOG["heaps_law_loglog_fit"].build(spark, str(tmp_path)).collect()
    by_bucket = {r["bucket"]: r for r in out}
    for r in out:
        assert (1 << r["bucket"]) <= r["anchor_tokens"] < (1 << (r["bucket"] + 1))
    # the curve's exact power-of-2 points land in their own bucket:
    # bucket k's anchor is the LAST curve point below 2^(k+1)
    assert by_bucket[0]["anchor_tokens"] == 1
    assert by_bucket[1]["anchor_tokens"] == 3  # points 2,3 -> last is 3
    assert by_bucket[2]["anchor_tokens"] == 7
    assert by_bucket[3]["anchor_tokens"] == 15  # points 8,9,15
    assert by_bucket[4]["anchor_tokens"] == 31  # points 16,17,31
    assert by_bucket[5]["anchor_tokens"] == 32
    assert by_bucket[6]["anchor_tokens"] == 100  # points 64,100
    # vocab equals tokens here (all words distinct) — anchors must agree
    for r in out:
        assert r["anchor_vocab"] == r["anchor_tokens"]
        assert r["total_tokens"] == 100
        assert r["total_vocab"] == 100

def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_boilerplate_flags_survive_short_docs(spark, tmp_path):
    # ADVICE r9: a doc with <2 words used to hit sequence(1,0) -> [1,0]
    # -> slice() INVALID_PARAMETER_VALUE.START; must yield zero positions
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "one", "en", "a", 3),
            (2, "", "en", "a", 0),
            (3, "two words here", "en", "a", 14),
        ],
    )
    out = {r["doc_id"]: r for r in CATALOG["boilerplate_ngram_flags"].build(spark, sf).collect()}
    assert (out[1]["n_pos"], out[1]["boiler_frac"]) == (0, 0.0)
    assert (out[2]["n_pos"], out[2]["boiler_frac"]) == (0, 0.0)
    assert out[3]["n_pos"] == 2


def test_neyman_allocation_single_doc_stratum(spark, tmp_path):
    # ADVICE r9: a single-document stratum used to produce 0.0/0 = NaN;
    # its stddev must now be exactly 0 and allocations stay finite
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "x", "en", "solo", 100),
            (2, "y", "en", "pair", 50),
            (3, "z", "en", "pair", 150),
        ],
    )
    out = {r["source"]: r for r in CATALOG["neyman_stratified_allocation"].build(spark, sf).collect()}
    assert out["solo"]["stddev_chars"] == 0.0
    assert out["solo"]["alloc_neyman"] == 0  # zero variance draws nothing
    assert out["pair"]["alloc_neyman"] > 0
    for r in out.values():
        assert r["alloc_prop"] >= 0 and not math.isnan(r["stddev_chars"])


def test_resample_nearest_identity_and_decimation():
    from citibike_deep_dive_spark.operators.multimodal import resample_nearest

    px = _random_px(6, 8, seed=21)
    np.testing.assert_array_equal(resample_nearest(px, 8, 6), px)  # identity
    half = resample_nearest(px, 4, 3)
    assert half.shape == (3, 4, 3)
    # source index of output (i, j) is (i*6//3, j*8//4) = (2i, 2j)
    np.testing.assert_array_equal(half, px[::2, ::2])


def test_resize_payload_real_for_decodable_formats():
    from citibike_deep_dive_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
        resample_nearest,
        resize_payload,
    )

    px = _random_px(8, 10, seed=22)
    # BMP in -> BMP out, pixels = real nearest-neighbor resample
    out = resize_payload(encode_bmp(px), 5, 4)
    np.testing.assert_array_equal(
        decode_bmp_pixels(out), resample_nearest(px, 5, 4)
    )
    # PNG in -> PNG out (format preserved, re-decodable)
    out = resize_payload(encode_png(px), 5, 4)
    assert out[:8] == b"\x89PNG\r\n\x1a\n"
    np.testing.assert_array_equal(
        decode_png_pixels(out), resample_nearest(px, 5, 4)
    )
    # compressed/undecodable -> deterministic fake, and the hard gate
    assert isinstance(resize_payload(b"jpeg junk", 5, 4, True), bytes)
    import pytest

    with pytest.raises(NotImplementedError):
        resize_payload(b"jpeg junk", 5, 4, deterministic_fake=False)


def test_resize_images_real_pixels_end_to_end(spark):
    from citibike_deep_dive_spark.operators.multimodal import (
        resample_nearest,
        resize_images,
    )

    px = _random_px(100, 300, seed=23)  # scale = min(224/300, 224/100, 1)
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(px)), 300, 100, 0)],
        "media_id long, kind string, payload binary, meta_width int, "
        "meta_height int, meta_duration_ms int",
    )
    row = resize_images(media, 224, 224).collect()[0]
    assert (row["dst_width"], row["dst_height"]) == (224, 74)
    out = decode_png_pixels(bytes(row["payload"]))
    np.testing.assert_array_equal(out, resample_nearest(px, 224, 74))
