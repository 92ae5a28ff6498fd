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
