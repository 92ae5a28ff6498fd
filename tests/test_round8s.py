"""Semantic properties of the round-8 continuation batch 17
(plans/round8s.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def _keep(text: str) -> int:
    w = text.lower().split(" ")
    nw = len(w)
    mwl = sum(len(x) for x in w) / nw
    fdup = 1.0 - len(set(w)) / nw
    return int(25 <= nw <= 90 and 4.2 <= mwl <= 5.2 and fdup < 0.6)


def test_fairness_parity_python_recompute(spark):
    rows = CATALOG["fairness_gate_parity"].build(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    for gtype, key in (("lang", "lang"), ("source", "source")):
        groups: dict = {}
        for d in docs:
            g = groups.setdefault(d[key], [0, 0])
            g[0] += 1
            g[1] += _keep(d["text"])
        max_rate = max(k / n for n, k in groups.values())
        got = {r["grp"]: r for r in rows if r["group_type"] == gtype}
        assert set(got) == set(groups)
        for grp, (n, k) in groups.items():
            r = got[grp]
            assert r["n_docs"] == n and r["n_kept"] == k
            assert abs(r["sel_rate"] - round(k / n, 4)) < 1e-9
            assert abs(r["dp_ratio"] - round(k / n / max_rate, 4)) < 1e-9
            assert r["fails_four_fifths"] == int(k / n / max_rate < 0.8)
    # the best-treated group in each type has dp_ratio 1
    for gtype in ("lang", "source"):
        assert any(
            r["dp_ratio"] == 1.0 for r in rows if r["group_type"] == gtype
        )


def test_ucb_bonus_rewards_thin_arms(spark):
    rows = CATALOG["ucb_source_allocation"].build(spark, SF_DIR).collect()
    assert rows
    big_n = sum(r["n_pulls"] for r in rows)
    for r in rows:
        expected_bonus = math.sqrt(2 * math.log(big_n) / r["n_pulls"])
        assert abs(r["bonus"] - round(expected_bonus, 4)) < 1e-9
        assert abs(r["ucb"] - round(r["n_reward"] / r["n_pulls"] + expected_bonus, 4)) < 2e-4
        assert 0.0 <= r["mean_reward"] <= 1.0
    # bonus strictly decreases with pulls
    by_pulls = sorted(rows, key=lambda r: r["n_pulls"])
    for a, b in zip(by_pulls, by_pulls[1:]):
        if a["n_pulls"] < b["n_pulls"]:
            assert a["bonus"] > b["bonus"]
    # ranks are a permutation consistent with the ucb ordering
    ranked = sorted(rows, key=lambda r: r["rank"])
    ucbs = [r["ucb"] for r in ranked]
    assert ucbs == sorted(ucbs, reverse=True)


def test_gate_pinned_to_gopher_quality_rules(spark):
    """The fairness/UCB audits and the Cramér's-V keep facet must apply
    EXACTLY the gate that gopher_quality_rules ships (one shared helper,
    gates.py) — a threshold drift here would audit a gate nobody runs."""
    from citibike_deep_dive_spark.plans.round8s import _gate
    from citibike_deep_dive_spark.plans.gates import gopher_keep_expr

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    canonical = {
        r["doc_id"]: r["keep"]
        for r in CATALOG["gopher_quality_rules"].build(spark, SF_DIR).collect()
    }
    audited = {r["doc_id"]: r["keep"] for r in _gate(docs).collect()}
    assert audited == canonical
    facet = {
        r["doc_id"]: r["keep"]
        for r in docs.select(
            "doc_id", gopher_keep_expr("text").alias("keep")
        ).collect()
    }
    assert facet == canonical
