"""Semantic properties of the round-8 continuation batch 10
(plans/round8l.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math
from collections import Counter

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_knn_shapley_efficiency_axiom(spark):
    """Shapley values for one query sum to the classifier's accuracy on
    that query: sum_i s_i = P(correct) = hit-rate among the K nearest.
    Across queries: sum over all corpus points of sum_mu equals the sum
    of per-query top-K hit fractions."""
    rows = CATALOG["knn_shapley_values"].build(spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    queries = [r for r in emb if r["vec_id"] % 50 == 0]
    corpus = [r for r in emb if r["vec_id"] % 50 != 0]
    assert len(rows) == len(corpus)
    K = 5

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 4)

    total_expected = 0.0
    for q in queries:
        ranked = sorted(
            corpus,
            key=lambda c: (-cos(q["embedding"], c["embedding"]), c["vec_id"]),
        )
        hits = sum(1 for c in ranked[:K] if c["label"] == q["label"])
        total_expected += hits / K
    total_got = sum(r["mean_shapley"] * r["n_queries"] for r in rows)
    assert abs(total_got - total_expected) < 1e-2
    # python recursion spot-check for the single query at sf0.001
    if len(queries) == 1:
        q = queries[0]
        ranked = sorted(
            corpus,
            key=lambda c: (-cos(q["embedding"], c["embedding"]), c["vec_id"]),
        )
        n = len(ranked)
        s = [0.0] * n
        hit = [1 if c["label"] == q["label"] else 0 for c in ranked]
        s[n - 1] = hit[n - 1] / n
        for i in range(n - 2, -1, -1):
            s[i] = s[i + 1] + (hit[i] - hit[i + 1]) * min(K, i + 1) / (K * (i + 1))
        got = {r["vec_id"]: r["mean_shapley"] for r in rows}
        for c, sv in zip(ranked, s):
            assert abs(got[c["vec_id"]] - sv) < 1e-5


def test_log_odds_prior_shrinks_rare_words(spark):
    rows = CATALOG["log_odds_fightin_words"].build(spark, SF_DIR).collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for s, rs in by_src.items():
        assert len(rs) <= 3
        for r in rs:
            assert r["z_score"] is not None
            assert r["c_source"] >= 1
            # overused terms have positive log-odds
            assert r["log_odds"] > 0 or r["z_score"] <= 0.5


def test_chao1_bounds(spark):
    rows = CATALOG["chao1_vocab_richness"].build(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    vocab: dict[str, Counter] = {}
    for d in docs:
        vocab.setdefault(d["source"], Counter()).update(d["text"].lower().split(" "))
    got = {r["source"]: r for r in rows}
    assert set(got) == set(vocab)
    for s, cnt in vocab.items():
        r = got[s]
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        assert r["vocab_obs"] == len(cnt)
        assert r["f1"] == f1 and r["f2"] == f2
        assert r["chao1_est"] >= r["vocab_obs"]  # estimator never below observed
        expected = len(cnt) + f1 * (f1 - 1) / (2 * (f2 + 1))
        assert abs(r["chao1_est"] - expected) < 0.01
        assert 0.0 <= r["good_coverage"] <= 1.0


def test_assortativity_python_recompute(spark):
    rows = CATALOG["knn_graph_assortativity"].build(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    pairs = CATALOG["mutual_knn_pairs"].build(spark, SF_DIR).collect()
    deg: Counter = Counter()
    for p in pairs:
        deg[p["id_a"]] += 1
        deg[p["id_b"]] += 1
    assert r["n_nodes"] == len(deg)
    assert r["n_edges"] == len(pairs)
    stubs = [(deg[p["id_a"]], deg[p["id_b"]]) for p in pairs]
    stubs += [(k, j) for j, k in stubs[: len(pairs)]]
    m = len(stubs)
    sjk = sum(j * k for j, k in stubs)
    sj = sum(j for j, _ in stubs)
    sjj = sum(j * j for j, _ in stubs)
    expected = (m * sjk - sj * sj) / (m * sjj - sj * sj)
    assert abs(r["assortativity"] - expected) < 1e-5
    assert -1.0 - 1e-9 <= r["assortativity"] <= 1.0 + 1e-9
    # mean degree is stubs/nodes (= 2E/n), NOT sum-of-source-degrees/n
    # (that would be the degree second moment: each node contributes
    # its degree d_i times to sum(j) over stubs).
    assert abs(r["mean_degree"] - m / len(deg)) < 5e-5
    assert abs(r["mean_degree"] - sum(deg.values()) / len(deg)) < 5e-5


def test_stl_recomposition_identity(spark):
    rows = CATALOG["stl_additive_decomposition"].build(spark, SF_DIR).collect()
    assert len(rows) == 30  # january days with events
    interior = [r for r in rows if r["trend"] is not None]
    assert len(interior) == len(rows) - 6  # 3 edge days each side
    for r in interior:
        # published columns recompose exactly (remainder built from the
        # rounded trend/seasonal)
        assert abs(r["y"] - (r["trend"] + r["seasonal"] + r["remainder"])) < 5e-4
    # seasonal depends only on dow
    by_dow = {}
    for r in rows:
        by_dow.setdefault(r["dow"], set()).add(r["seasonal"])
    assert all(len(v) == 1 for v in by_dow.values())
    # seasonal components center to ~0
    assert abs(sum(next(iter(v)) for v in by_dow.values())) < 0.01


def test_rbo_monotone_and_bounded(spark):
    rows = sorted(
        CATALOG["rank_biased_overlap"].build(spark, SF_DIR).collect(),
        key=lambda r: r["depth"],
    )
    assert len(rows) == 50
    prev_rbo = 0.0
    prev_cnt = 0
    for r in rows:
        assert 0.0 <= r["agreement"] <= 1.0
        assert r["overlap_count"] >= prev_cnt  # overlap never shrinks
        assert r["rbo_at_depth"] >= prev_rbo - 1e-9  # prefix sum monotone
        assert r["rbo_at_depth"] <= 1.0 + 1e-9
        prev_rbo, prev_cnt = r["rbo_at_depth"], r["overlap_count"]
    # python recompute of the two rankings and the truncated RBO
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    stats = [
        (d["doc_id"], d["n_chars"], len(set(d["text"].lower().split(" "))))
        for d in docs
    ]
    top_a = [t[0] for t in sorted(stats, key=lambda t: (-t[1], t[0]))[:50]]
    top_b = [t[0] for t in sorted(stats, key=lambda t: (-t[2], t[0]))[:50]]
    rbo = 0.0
    for d, r in zip(range(1, 51), rows):
        cnt = len(set(top_a[:d]) & set(top_b[:d]))
        assert r["overlap_count"] == cnt
        rbo += (1 - 0.9) * 0.9 ** (d - 1) * cnt / d
        assert abs(r["rbo_at_depth"] - rbo) < 1e-5
