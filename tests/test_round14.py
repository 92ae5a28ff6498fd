"""Round-14 optimization pins: the vectorized single-block MD5 behind
repeated_substring_spans, and the bucket-local numpy pair generation
behind simhash_hamming_pairs (both must be bit-identical to the forms
they replaced — the oracles did not move)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from citibike_deep_dive_spark.functions.md5vec import (
    md5_hash60_block16,
    md5_hash60_windows16,
)


def _ref_hash60(window: bytes) -> int:
    return int(hashlib.md5(window).hexdigest()[:15], 16)


def test_md5vec_matches_hashlib_random_bytes():
    rng = np.random.default_rng(7)
    for n in (16, 17, 31, 1000):
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        got = md5_hash60_windows16(data)
        exp = [_ref_hash60(data[i : i + 16]) for i in range(n - 15)]
        assert got.dtype == np.int64
        assert list(got) == exp


def test_md5vec_matches_hashlib_ascii_text():
    text = ("the quick brown fox jumps over the lazy dog " * 40).encode()
    got = md5_hash60_windows16(text)
    exp = [_ref_hash60(text[i : i + 16]) for i in range(len(text) - 15)]
    assert list(got) == exp


def test_md5vec_block16_rejects_nothing_but_empty():
    assert md5_hash60_block16(np.empty((0, 4), dtype=np.uint32)).shape == (0,)


def test_md5vec_equals_portable_hash64_contract():
    """The engine gram key is conv(substring(md5(g),1,15),16,10); the
    vectorized form must agree with that parse, incl. leading zeros."""
    # craft windows until one has a leading-zero hex digest nibble
    rng = np.random.default_rng(11)
    seen_small = False
    for _ in range(200):
        w = rng.integers(0, 256, size=16, dtype=np.uint8).tobytes()
        v = md5_hash60_windows16(w)[0]
        assert v == _ref_hash60(w)
        if v < (1 << 56):
            seen_small = True
    assert seen_small  # leading-zero digests exercised


@pytest.fixture(scope="module")
def spark():
    from citibike_deep_dive_spark.session import get_spark

    return get_spark(
        app_name="test-round14",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def test_simhash_bucket_pairs_match_join_form(spark):
    """The applyInPandas bucket map must emit exactly the pairs of the
    r13 band self-join (same first-band dedup, same hamming filter):
    rebuild the join form inline and compare full row sets."""
    from pyspark.sql import functions as F

    from citibike_deep_dive_spark.operators.dedup import simhash
    from citibike_deep_dive_spark.plans import CATALOG
    from citibike_deep_dive_spark.plans.training import (
        _HAMMING_BANDS,
        _HAMMING_MAX,
    )

    sf_dir = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = simhash(docs, bits=16)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(_HAMMING_BANDS)])).alias("b"),
    ).withColumn("bv", F.expr("shiftright(simhash, 4 * b) & 15"))
    a = bands.select(
        "b", "bv", F.col("doc_id").alias("doc_id_a"), F.col("simhash").alias("sa")
    )
    b = bands.select(
        "b", "bv", F.col("doc_id").alias("doc_id_b"), F.col("simhash").alias("sb")
    )
    first_band = None
    for j in range(_HAMMING_BANDS - 1):
        t = F.expr(
            f"(shiftright(sa, {4 * j}) & 15) != (shiftright(sb, {4 * j}) & 15)"
        ) | (F.col("b") <= j)
        first_band = t if first_band is None else first_band & t
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    join_form = (
        a.join(b, ["b", "bv"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .filter(first_band)
        .filter(hamming <= _HAMMING_MAX)
        .select("doc_id_a", "doc_id_b", hamming.cast("long").alias("hamming"))
    )
    exp = {(r.doc_id_a, r.doc_id_b, r.hamming) for r in join_form.collect()}
    got_df = CATALOG["simhash_hamming_pairs"].build(spark, sf_dir)
    got = {(r.doc_id_a, r.doc_id_b, r.hamming) for r in got_df.collect()}
    assert len(got) == len(exp)
    assert got == exp

def test_sparse_cosine_pairgen_matches_join_form(spark):
    """The key-local numpy pair map behind sparse_cosine_neardup_pairs
    must reproduce the posting self-join exactly, including the
    hash-collision edge (same doc twice under one key pairs with OTHER
    docs twice but never with itself) — compare against the r13 join
    form rebuilt inline at sf0.01."""
    from pyspark.sql import functions as F

    from citibike_deep_dive_spark.plans import CATALOG
    from citibike_deep_dive_spark.plans.catalog import table
    from citibike_deep_dive_spark.functions.portable import portable_hash64
    from citibike_deep_dive_spark.plans.round8d import (
        _SC_MAX_DF,
        _SC_THRESHOLD,
    )

    sf_dir = "/root/testdata/sf0.01"
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    toks = docs.select("doc_id", ws.alias("ws")).filter(F.size("ws") >= 3)
    tri = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws)-2),"
                    " i -> concat(ws[i-1],' ',ws[i],' ',ws[i+1]))"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    n = tri.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    dfq = tri.groupBy("g").agg(F.count("*").cast("long").alias("df"))
    w = (
        tri.join(dfq, "g")
        .crossJoin(F.broadcast(n))
        .filter((F.col("df") >= 2) & (F.col("df") <= _SC_MAX_DF))
        .select(
            "doc_id",
            portable_hash64(F.col("g")).alias("k"),
            (
                F.col("tf")
                * F.round(
                    F.log(F.col("n").cast("double") / F.col("df")) * 1000, 0
                ).cast("long")
            ).alias("w"),
        )
    )
    nrm = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("n2")
    )
    wn = w.join(nrm, "doc_id")
    a, b = wn.alias("a"), wn.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.sum(F.col("a.w") * F.col("b.w")).cast("long").alias("dot"),
            F.count("*").cast("long").alias("shared_terms"),
            F.min("a.n2").alias("na"),
            F.min("b.n2").alias("nb"),
        )
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    join_form = dots.filter(cos >= _SC_THRESHOLD).select(
        "doc_a", "doc_b", "shared_terms", F.round(cos, 4).alias("cosine")
    )
    exp = {tuple(r) for r in join_form.collect()}
    got_df = CATALOG["sparse_cosine_neardup_pairs"].build(spark, sf_dir)
    got = {tuple(r) for r in got_df.collect()}
    assert len(got) == len(exp)
    assert got == exp


# ---------------------------------------------------------------------------
# r14 codec hot-loop rewrites: every fast kernel pinned against a
# straight-off-the-spec reference implementation (the forms the code
# used before the rewrite)
# ---------------------------------------------------------------------------


def test_crc_tables_match_bitwise_reference():
    from citibike_deep_dive_spark.operators.codecs import _crc8, _crc16

    def ref8(data):
        crc = 0
        for b in data:
            crc ^= b
            for _ in range(8):
                crc = (
                    ((crc << 1) ^ 0x07) & 0xFF
                    if crc & 0x80
                    else (crc << 1) & 0xFF
                )
        return crc

    def ref16(data):
        crc = 0
        for b in data:
            crc ^= b << 8
            for _ in range(8):
                crc = (
                    ((crc << 1) ^ 0x8005) & 0xFFFF
                    if crc & 0x8000
                    else (crc << 1) & 0xFFFF
                )
        return crc

    rng = np.random.default_rng(5)
    for n in (0, 1, 7, 256, 4093):
        data = bytes(rng.integers(0, 256, size=n).astype(np.uint8))
        assert _crc8(data) == ref8(data)
        assert _crc16(data) == ref16(data)


def test_huffman_prefix_lut_matches_canonical_walk():
    """The 256-entry first-level LUT must reproduce the T.81 F.2.2.3
    maxcode walk for every possible 8-bit prefix, on random valid
    canonical tables (codes of length 1..16)."""
    from citibike_deep_dive_spark.operators.codecs import _decode_tables

    rng = np.random.default_rng(6)
    for _ in range(40):
        # random canonical code-length histogram that stays feasible
        # (kraft sum <= 1): greedily place up to the remaining budget
        bits = [0] * 16
        budget = 1.0
        nvals = 0
        for length in range(1, 17):
            cap = int(budget * (1 << length)) - 1
            if cap <= 0:
                continue
            take = int(rng.integers(0, min(cap, 8) + 1))
            bits[length - 1] = take
            budget -= take / (1 << length)
            nvals += take
        if nvals == 0:
            bits[1] = 1
            nvals = 1
        vals = list(rng.integers(0, 256, size=nvals).astype(int))
        tab = _decode_tables(bits, vals)
        maxcode, mincode, valptr, tvals, fast_len, fast_val = tab
        for prefix in range(256):
            code16 = prefix << 8  # low bits irrelevant for len <= 8
            walk = None
            for length in range(1, 9):
                c = code16 >> (16 - length)
                if c <= maxcode[length]:
                    walk = (length, tvals[valptr[length] + c - mincode[length]])
                    break
            if walk is None:
                assert fast_len[prefix] == 0
            else:
                assert (fast_len[prefix], fast_val[prefix]) == walk


def test_flac_fixed_cumsum_matches_scalar_recurrence():
    """The k-fold-cumsum FIXED reconstruction must equal the per-sample
    recurrences for all orders over random warmups/residuals."""
    rng = np.random.default_rng(7)
    for order in range(5):
        for _ in range(20):
            bs = int(rng.integers(order + 1, 400))
            warm = [int(v) for v in rng.integers(-32768, 32768, size=order)]
            res = [int(v) for v in rng.integers(-(1 << 17), 1 << 17, size=bs - order)]
            # scalar reference (the pre-rewrite specialized recurrences)
            out = list(warm)
            if order == 0:
                out = list(res)
            elif order == 1:
                p1 = out[0]
                for r in res:
                    p1 = r + p1
                    out.append(p1)
            elif order == 2:
                p2, p1 = out[0], out[1]
                for r in res:
                    v = r + 2 * p1 - p2
                    out.append(v)
                    p2, p1 = p1, v
            elif order == 3:
                p3, p2, p1 = out[0], out[1], out[2]
                for r in res:
                    v = r + 3 * p1 - 3 * p2 + p3
                    out.append(v)
                    p3, p2, p1 = p2, p1, v
            else:
                p4, p3, p2, p1 = out[0], out[1], out[2], out[3]
                for r in res:
                    v = r + 4 * p1 - 6 * p2 + 4 * p3 - p4
                    out.append(v)
                    p4, p3, p2, p1 = p3, p2, p1, v
            # vectorized form (mirrors _flac_subframe)
            w = np.asarray(warm, dtype=np.int64)
            z = np.asarray(res, dtype=np.int64)
            for j in range(order - 1, -1, -1):
                z = int(np.diff(w, n=j)[-1]) + np.cumsum(z)
            got = np.concatenate([w, z]) if order else z
            assert got.tolist() == out


def test_flac_rice_inline_reader_long_unary_runs():
    """Rice decode with quotients spanning multiple all-zero bytes and
    param=0 codes — the inline reader's rare branches — against the
    values the writer encoded."""
    from citibike_deep_dive_spark.operators.codecs import (
        _FlacBitReader,
        _FlacBitWriter,
        _flac_residual,
        _zigzag_encode,
    )

    for param in (0, 3, 14):
        values = [0, 1, -1, 5, -200, 3000, -70000, 12, 0, -1, 99999, -7]
        bw = _FlacBitWriter()
        bw.write(0, 2)  # method 0: 4-bit rice
        bw.write(0, 4)  # partition order 0
        bw.write(param, 4)
        for v in values:
            u = _zigzag_encode(v)
            bw.write_unary(u >> param)
            bw.write(u, param)
        bw.align()
        rd = _FlacBitReader(bytes(bw.buf), 0)
        got = _flac_residual(rd, bs=len(values), order=0)
        assert got == values
