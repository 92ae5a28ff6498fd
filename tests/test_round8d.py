"""Semantic properties of the round-8 continuation batch 2
(plans/round8d.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# good_turing_bigram_smoothing
# ---------------------------------------------------------------------------


def test_good_turing_estimates_are_coherent(spark):
    rows = (
        CATALOG["good_turing_bigram_smoothing"].build(spark, SF_DIR)
        .orderBy("r")
        .collect()
    )
    assert rows
    assert 0.0 < rows[0]["p_unseen"] < 1.0
    slope = rows[0]["lgt_slope"]
    # the synthetic template corpus can give either slope sign; what must
    # hold is the LGT identity r* = r ((r+1)/r)^(b+1) against the fitted b
    for r in rows:
        assert r["n_r"] >= 1
        assert r["z_r"] > 0.0
        assert r["lgt_slope"] == slope  # constant column
        expect = r["r"] * ((r["r"] + 1) / r["r"]) ** (slope + 1.0)
        assert abs(r["r_star_lgt"] - expect) < 1e-3 * max(1.0, expect)
        if r["r_star_turing"] is not None:
            # raw Turing estimate only defined on contiguous frequencies
            assert r["r_star_turing"] > 0.0


def test_good_turing_unseen_mass_is_n1_over_n(spark):
    rows = CATALOG["good_turing_bigram_smoothing"].build(spark, SF_DIR).collect()
    r1 = [r for r in rows if r["r"] == 1]
    if r1:  # N1 exists at this scale
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
        total = sum(max(len(d["text"].lower().split(" ")) - 1, 0) for d in docs)
        assert abs(r1[0]["p_unseen"] - r1[0]["n_r"] / total) < 1e-6


# ---------------------------------------------------------------------------
# dp_noisy_histogram
# ---------------------------------------------------------------------------


def test_dp_noise_is_laplace_inverse_cdf_and_deterministic(spark):
    rows = CATALOG["dp_noisy_histogram"].build(spark, SF_DIR).collect()
    again = CATALOG["dp_noisy_histogram"].build(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))  # replayable
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["true_count"] for r in rows) == n_docs
    for r in rows:
        assert r["epsilon"] == 1.0
        assert abs(r["noisy_count"] - (r["true_count"] + r["laplace_noise"])) < 2e-4
    # Laplace(1) noise: essentially all mass within +-10
    assert all(abs(r["laplace_noise"]) < 10 for r in rows)
    # and the noise is not degenerate (distinct buckets -> distinct noise)
    assert len({r["laplace_noise"] for r in rows}) > 1


# ---------------------------------------------------------------------------
# stylometry_burrows_delta
# ---------------------------------------------------------------------------


def test_burrows_delta_is_a_semimetric_sample(spark):
    rows = CATALOG["stylometry_burrows_delta"].build(spark, SF_DIR).collect()
    sources = set()
    for r in rows:
        sources.add(r["source_a"])
        sources.add(r["source_b"])
        assert r["source_a"] < r["source_b"]  # half-matrix, no self-pairs
        assert r["burrows_delta"] >= 0.0
        assert r["n_words"] >= 1
    s = len(sources)
    assert len(rows) == s * (s - 1) // 2  # every unordered pair present
    # z-scored distances: mean pairwise delta is O(1), not O(rate)
    mean_delta = sum(r["burrows_delta"] for r in rows) / len(rows)
    assert 0.1 < mean_delta < 5.0


# ---------------------------------------------------------------------------
# sparse_cosine_neardup_pairs
# ---------------------------------------------------------------------------


def test_sparse_cosine_pairs_bounds_and_symmetry_free(spark):
    rows = CATALOG["sparse_cosine_neardup_pairs"].build(spark, SF_DIR).collect()
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert 0.5 <= r["cosine"] <= 1.0 + 1e-9
        assert r["shared_terms"] >= 1


def test_sparse_cosine_finds_a_planted_neardup(spark):
    """A document sharing almost all shingles with another must surface:
    verify against a brute-force python cosine on the same tf-idf
    weights for the top-scoring pair."""
    rows = CATALOG["sparse_cosine_neardup_pairs"].build(spark, SF_DIR).collect()
    if not rows:  # sf0.001 corpus may lack near-dups above threshold
        return
    top = max(rows, key=lambda r: r["cosine"])
    docs = {
        d["doc_id"]: d["text"].lower().split(" ")
        for d in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }

    def shingles(wsl):
        return [" ".join(wsl[i : i + 3]) for i in range(len(wsl) - 2)]

    tf: dict[int, dict[str, int]] = {}
    for did, wsl in docs.items():
        if len(wsl) < 3:
            continue
        m: dict[str, int] = {}
        for g in shingles(wsl):
            m[g] = m.get(g, 0) + 1
        tf[did] = m
    n = len(tf)
    dfm: dict[str, int] = {}
    for m in tf.values():
        for g in m:
            dfm[g] = dfm.get(g, 0) + 1
    def wvec(did):
        return {
            g: c * round(math.log(n / dfm[g]) * 1e3)
            for g, c in tf[did].items()
            if 2 <= dfm[g] <= 100
        }
    wa, wb = wvec(top["doc_a"]), wvec(top["doc_b"])
    dot = sum(wa[g] * wb[g] for g in wa.keys() & wb.keys())
    na = math.sqrt(sum(v * v for v in wa.values()))
    nb = math.sqrt(sum(v * v for v in wb.values()))
    assert abs(top["cosine"] - dot / (na * nb)) < 1e-3
