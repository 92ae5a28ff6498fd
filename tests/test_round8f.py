"""Semantic properties of the round-8 continuation batch 4
(plans/round8f.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_query_likelihood_scores_are_negative_and_ranked(spark):
    rows = CATALOG["query_likelihood_dirichlet"].build(spark, SF_DIR).collect()
    assert len(rows) == 15
    scores = [r["log_likelihood"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # each term contributes ln(p) with p < 1 -> strictly negative totals
    assert all(s < 0.0 for s in scores)


def test_query_likelihood_matches_python_for_top_doc(spark):
    rows = CATALOG["query_likelihood_dirichlet"].build(spark, SF_DIR).collect()
    top = rows[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    words = {d["doc_id"]: d["text"].lower().split(" ") for d in docs}
    terms = ("spark", "vector", "merge")
    ctot = sum(len(w) for w in words.values())
    cf = {t: sum(w.count(t) for w in words.values()) for t in terms}
    wl = words[top["doc_id"]]
    expect = sum(
        math.log((wl.count(t) + 100.0 * cf[t] / ctot) / (len(wl) + 100.0))
        for t in terms
    )
    assert abs(top["log_likelihood"] - expect) < 1e-4


def test_wilcoxon_rank_sum_identity(spark):
    [r] = CATALOG["wilcoxon_signed_rank_daily"].build(spark, SF_DIR).collect()
    n = r["n_days"]
    assert n >= 1
    # W+ + W- = n(n+1)/2 always (rank sums partition the total)
    assert abs(r["w_plus"] + r["w_minus"] - n * (n + 1) / 2) < 1e-6
    assert r["w_plus"] >= 0 and r["w_minus"] >= 0
    # z sign agrees with which rank sum dominates
    if r["w_plus"] > r["w_minus"]:
        assert r["z_score"] > 0
    elif r["w_plus"] < r["w_minus"]:
        assert r["z_score"] < 0


def test_kr20_constant_and_bounded(spark):
    rows = CATALOG["kr20_gate_reliability"].build(spark, SF_DIR).collect()
    assert len(rows) == 4
    alphas = {r["kr20"] for r in rows}
    assert len(alphas) == 1  # constant battery column
    alpha = alphas.pop()
    assert alpha <= 1.0  # KR-20 upper bound (can be negative)
    for r in rows:
        assert 0.0 <= r["difficulty"] <= 1.0
        assert r["n_pass"] >= 0


def test_sprt_decision_consistent_with_crossing(spark):
    [r] = CATALOG["ab_sequential_sprt"].build(spark, SF_DIR).collect()
    bound = math.log(19.0)
    assert r["n_events"] > 0
    if r["decision"] == "continue":
        assert r["crossed_at"] is None
        assert abs(r["final_llr"]) < bound + 1e-6
    else:
        assert r["crossed_at"] is not None
        assert r["llr_at_crossing"] is not None
        if r["decision"] == "accept_h1":
            assert r["llr_at_crossing"] >= bound - 1e-6
        else:
            assert r["llr_at_crossing"] <= -bound + 1e-6


def test_sprt_final_llr_matches_counts(spark):
    [r] = CATALOG["ab_sequential_sprt"].build(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    clicks = sum(1 for e in ev if e["event_type"] == "click")
    views = sum(1 for e in ev if e["event_type"] == "view")
    assert r["n_events"] == clicks + views
    expect = clicks * math.log(0.55 / 0.5) + views * math.log(0.45 / 0.5)
    assert abs(r["final_llr"] - expect) < 1e-4


def test_mcnemar_cells_partition_and_chi2(spark):
    [r] = CATALOG["mcnemar_gate_disagreement"].build(spark, SF_DIR).collect()
    assert (
        r["both_pass"] + r["len_only"] + r["punct_only"] + r["neither"] == r["n"]
    )
    b, c = r["len_only"], r["punct_only"]
    if b + c > 0:
        assert abs(r["chi2"] - (b - c) ** 2 / (b + c)) < 1e-4
        assert abs(r["chi2_corrected"] - (abs(b - c) - 1) ** 2 / (b + c)) < 1e-4
        assert r["chi2_corrected"] <= r["chi2"] + 1e-9 or b == c
