"""Semantic properties of the round-8 continuation batch 14
(plans/round8p.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math
from collections import Counter

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_min_k_prob_python_recompute(spark):
    rows = CATALOG["min_k_prob_membership"].build(spark, SF_DIR).collect()
    assert len(rows) == 25
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    corpus: Counter = Counter()
    toks = {}
    for d in docs:
        ws = d["text"].lower().split(" ")
        toks[d["doc_id"]] = ws
        corpus.update(ws)
    t = sum(corpus.values())
    v = len(corpus)
    scores = {}
    for did, ws in toks.items():
        lps = sorted(
            (int(round(1e6 * math.log((corpus[w] + 1.0) / (t + v)))), w) for w in ws
        )
        k = max(1, len(ws) // 5)
        s = sum(lp for lp, _ in lps[:k])
        scores[did] = (s / k, len(ws), k)
    top = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:25]
    got = sorted(rows, key=lambda r: r["rank"])
    for (did, (mean_mu, n, k)), r in zip(top, got):
        assert r["doc_id"] == did
        assert r["n_tokens"] == n
        assert r["k"] == k
        assert abs(r["min_k_logp"] - mean_mu / 1e6) < 1e-4
        assert r["min_k_logp"] < 0  # log-probs


def test_rich_club_monotone_in_density(spark):
    rows = sorted(
        CATALOG["rich_club_coefficient"].build(spark, SF_DIR).collect(),
        key=lambda r: r["k"],
    )
    assert rows
    pairs = CATALOG["mutual_knn_pairs"].build(spark, SF_DIR).collect()
    deg: Counter = Counter()
    for p in pairs:
        deg[p["id_a"]] += 1
        deg[p["id_b"]] += 1
    for r in rows:
        nodes = {n for n, d in deg.items() if d > r["k"]}
        edges = sum(
            1 for p in pairs if p["id_a"] in nodes and p["id_b"] in nodes
        )
        assert r["n_nodes"] == len(nodes)
        assert r["n_edges"] == edges
        expected = 2.0 * edges / (len(nodes) * (len(nodes) - 1))
        assert abs(r["phi"] - expected) < 1e-6
        assert 0.0 <= r["phi"] <= 1.0
    # node sets shrink as the threshold rises
    ns = [r["n_nodes"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_pca_outliers_residual_nonnegative_and_bounded(spark):
    rows = CATALOG["pca_outlier_scores"].build(spark, SF_DIR).collect()
    assert len(rows) == 20
    ranked = sorted(rows, key=lambda r: r["rank"])
    vals = [r["residual_var"] for r in ranked]
    assert vals == sorted(vals, reverse=True)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    # residual energy can never exceed the total centered energy of the
    # 16-dim slice; compute the max over vectors as a loose upper bound
    dims = list(zip(*[e["embedding"][:16] for e in emb]))
    mus = [sum(col) / len(col) for col in dims]
    max_norm2 = max(
        sum((x - m) ** 2 for x, m in zip(e["embedding"][:16], mus)) for e in emb
    )
    for r in rows:
        assert -1e-6 <= r["residual_var"] <= max_norm2 + 1e-3
