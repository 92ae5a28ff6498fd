"""Semantic properties of the round-8 continuation batch 9
(plans/round8k.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math
from collections import Counter

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()


def test_bradley_terry_matches_python_mm(spark):
    rows = CATALOG["bradley_terry_strengths"].build(spark, SF_DIR).collect()
    docs = _docs(spark)
    by_src: dict[str, list[int]] = {}
    for d in docs:
        by_src.setdefault(d["source"], []).append(d["n_chars"])
    srcs = sorted(by_src)
    w2 = {i: 0 for i in srcs}  # total wins in half-units
    n_tot = {i: 0 for i in srcs}
    pair_n = {}
    for i in srcs:
        for j in srcs:
            if i == j:
                continue
            wins = sum(1 for a in by_src[i] for b in by_src[j] if a > b)
            ties = sum(1 for a in by_src[i] for b in by_src[j] if a == b)
            w2[i] += 2 * wins + ties
            n = len(by_src[i]) * len(by_src[j])
            pair_n[(i, j)] = n
            n_tot[i] += n
    p1 = {i: round(w2[i] / n_tot[i], 6) for i in srcs}
    den = {
        i: sum(
            int(round(1e6 * pair_n[(i, j)] / (p1[i] + p1[j])))
            for j in srcs
            if j != i
        )
        for i in srcs
    }
    p2 = {i: (w2[i] * 1e6 / 2.0) / den[i] for i in srcs}
    p2_mu = {i: int(round(p2[i] * 1e6)) for i in srcs}
    z = sum(p2_mu.values())
    got = {r["source"]: r for r in rows}
    assert set(got) == set(srcs)
    for i in srcs:
        r = got[i]
        assert r["n_comparisons"] == n_tot[i]
        assert abs(r["win_rate"] - w2[i] / (2 * n_tot[i])) < 1e-6
        assert abs(r["strength"] - p2[i]) < 1e-5
        assert abs(r["pi_norm"] - p2_mu[i] / z) < 1e-5
    # ranks are a permutation ordered by strength
    ranked = sorted(rows, key=lambda r: r["rank"])
    strengths = [r["strength"] for r in ranked]
    assert strengths == sorted(strengths, reverse=True)
    assert sorted(r["rank"] for r in rows) == list(range(1, len(srcs) + 1))
    # a higher win_rate player should generally hold a higher strength:
    # check the extremes agree
    best = max(rows, key=lambda r: r["win_rate"])
    assert best["rank"] <= 3


def test_cuped_matches_python_recompute(spark):
    import hashlib

    rows = CATALOG["cuped_adjusted_ab"].build(spark, SF_DIR).collect()
    assert {r["arm"] for r in rows} == {"control", "treatment"}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    split_us = 1_705_363_200_000_000
    users: dict[int, list[int]] = {}
    for e in ev:
        ts = e["ts"]
        us = (
            (ts - ts % 1000) // 1000
            if isinstance(ts, int)
            else int(ts.timestamp() * 1e6)
            if ts.tzinfo
            else (ts - __import__("datetime").datetime(1970, 1, 1)).total_seconds()
            * 1e6
        )
        xy = users.setdefault(e["user_id"], [0, 0])
        xy[0 if us < split_us else 1] += int(round(e["value"] * 100))
    arm_of = {
        u: "control"
        if int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2 == 0
        else "treatment"
        for u in users
    }
    n = len(users)
    sx = sum(x for x, _ in users.values())
    sy = sum(y for _, y in users.values())
    sxx = sum(x * x for x, _ in users.values())
    sxy = sum(x * y for x, y in users.values())
    theta = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    xbar = sx / n
    got = {r["arm"]: r for r in rows}
    for arm in ("control", "treatment"):
        ids = [u for u in users if arm_of[u] == arm]
        na = len(ids)
        sya = sum(users[u][1] for u in ids)
        sxa = sum(users[u][0] for u in ids)
        r = got[arm]
        assert r["n_users"] == na
        assert abs(r["theta"] - theta) < 1e-9
        assert abs(r["mean_y"] - round(sya / (100 * na), 4)) < 1e-9
        assert (
            abs(r["adjusted_mean"] - round((sya - theta * (sxa - na * xbar)) / (100 * na), 4))
            < 1e-6
        )
        assert r["var_reduction_pct"] <= 100.0


def test_jsd_bounds_and_python_check(spark):
    rows = CATALOG["js_divergence_source_unigrams"].build(spark, SF_DIR).collect()
    docs = _docs(spark)
    sc: dict[str, Counter] = {}
    for d in docs:
        sc.setdefault(d["source"], Counter()).update(d["text"].lower().split(" "))
    corpus: Counter = Counter()
    for c in sc.values():
        corpus.update(c)
    t = sum(corpus.values())
    got = {r["source"]: r for r in rows}
    assert set(got) == set(sc)
    ln2 = math.log(2)
    for s, cnt in sc.items():
        ts = sum(cnt.values())
        jsd = 0.0
        qcov = 0.0
        for tok, c in cnt.items():
            p, q = c / ts, corpus[tok] / t
            m = (p + q) / 2
            jsd += 0.5 * (p * math.log(p / m) + q * math.log(q / m))
            qcov += q
        jsd += 0.5 * ln2 * (1 - qcov)
        r = got[s]
        assert 0.0 <= r["jsd_nats"] <= ln2 + 1e-9
        assert abs(r["jsd_nats"] - jsd) < 1e-4
        assert abs(r["jsd_bits"] - jsd / ln2) < 1e-4
        assert r["n_tokens"] == ts
        assert r["vocab"] == len(cnt)


def test_ari_pair_counting_identity(spark):
    rows = CATALOG["adjusted_rand_labels_vs_cells"].build(spark, SF_DIR).collect()
    assert rows
    n = sum(r["n_vectors"] for r in rows)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert n == emb  # every vector assigned exactly once
    aris = {r["ari"] for r in rows}
    assert len(aris) == 1  # scalar carried on every row
    ari = aris.pop()
    assert -1.0 - 1e-9 <= ari <= 1.0 + 1e-9
    for r in rows:
        assert 0.0 < r["purity"] <= 1.0
        assert 0 <= r["majority_label"] <= 9


def test_doremi_softmax_and_ordering(spark):
    rows = CATALOG["doremi_domain_reweight_step"].build(spark, SF_DIR).collect()
    assert rows
    tot = sum(r["alpha_new"] for r in rows)
    assert abs(tot - 1.0) < 1e-3  # normalized mixture (6dp rounding slack)
    assert min(r["excess_nll"] for r in rows) == 0.0  # measured from the best
    # monotone: higher excess loss never gets a smaller weight
    srt = sorted(rows, key=lambda r: r["excess_nll"])
    for a, b in zip(srt, srt[1:]):
        assert a["alpha_new"] <= b["alpha_new"] + 1e-9


def test_kmv_exact_columns_and_graceful_degradation(spark):
    rows = CATALOG["kmv_sketch_set_ops"].build(spark, SF_DIR).collect()
    docs = _docs(spark)
    vocab: dict[str, set] = {}
    for d in docs:
        vocab.setdefault(d["source"], set()).update(d["text"].lower().split(" "))
    srcs = sorted(vocab)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        va, vb = vocab[r["source_a"]], vocab[r["source_b"]]
        union = len(va | vb)
        inter = len(va & vb)
        assert r["union_exact"] == union
        assert abs(r["jaccard_exact"] - round(inter / union, 4)) < 1e-9
        assert 0.0 <= r["jaccard_est"] <= 1.0
        # small unions (< k) are exact by the degradation rule
        if union < 32:
            assert r["union_est"] == float(union)
            assert abs(r["jaccard_est"] - round(inter / union, 4)) < 1e-9
        else:
            # KMV with k=32 should land within a loose multiplicative band
            assert union / 4 <= r["union_est"] <= union * 4
