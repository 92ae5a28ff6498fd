"""Semantic properties of the round-8 continuation batch 13
(plans/round8o.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def _daily(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily: dict = {}
    for e in ev:
        d = e["ts"].date()
        xy = daily.setdefault(d, [0, 0])
        if e["event_type"] == "click":
            xy[0] += 1
        elif e["event_type"] == "view":
            xy[1] += 1
    return daily


def test_distance_correlation_python_recompute(spark):
    rows = CATALOG["distance_correlation_daily"].build(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    daily = _daily(spark)
    xs = [v[0] for v in daily.values()]
    ys = [v[1] for v in daily.values()]
    n = len(xs)
    assert r["n_days"] == n

    def centered(vals):
        a = [[abs(vals[i] - vals[j]) for j in range(n)] for i in range(n)]
        rm = [sum(row) / n for row in a]
        cm = [sum(a[i][j] for i in range(n)) / n for j in range(n)]
        g = sum(map(sum, a)) / (n * n)
        return [[a[i][j] - rm[i] - cm[j] + g for j in range(n)] for i in range(n)]

    ax, ay = centered(xs), centered(ys)
    vxy = sum(ax[i][j] * ay[i][j] for i in range(n) for j in range(n))
    vxx = sum(ax[i][j] ** 2 for i in range(n) for j in range(n))
    vyy = sum(ay[i][j] ** 2 for i in range(n) for j in range(n))
    dcor = math.sqrt(vxy / math.sqrt(vxx * vyy))
    assert abs(r["dcov2"] - vxy / (n * n)) < 1e-3
    assert abs(r["dcor"] - dcor) < 1e-4
    assert 0.0 <= r["dcor"] <= 1.0


def test_clarity_terms_positive_and_scalar_consistent(spark):
    rows = CATALOG["clarity_score_qpp"].build(spark, SF_DIR).collect()
    assert len(rows) == 10
    clar = {r["clarity"] for r in rows}
    assert len(clar) == 1  # scalar carried on every row
    ranked = sorted(rows, key=lambda r: r["rank"])
    kls = [r["kl_term"] for r in ranked]
    assert kls == sorted(kls, reverse=True)
    for r in rows:
        assert r["rel_count"] >= 1
        assert r["corpus_count"] >= r["rel_count"]


def test_ipw_positivity_and_weighted_average(spark):
    rows = CATALOG["ipw_ate_estimate"].build(spark, SF_DIR).collect()
    assert rows
    ates = {r["ate"] for r in rows}
    assert len(ates) == 1
    tot = sum(r["n_users"] for r in rows)
    # the ATE is the n-weighted mean of the (unrounded) bucket effects;
    # with rounded columns it should still be close
    approx = sum(r["bucket_effect"] * r["n_users"] for r in rows) / tot
    assert abs(ates.pop() - approx) < 0.05
    for r in rows:
        assert 0 < r["n_treated"]
        assert 0 < r["n_control"]
        assert 0.0 < r["propensity"] < 1.0
        assert r["n_treated"] + r["n_control"] == r["n_users"]


def test_did_randomized_split_near_zero_and_identity(spark):
    rows = CATALOG["did_panel_estimate"].build(spark, SF_DIR).collect()
    assert len(rows) == 4
    cells = {(r["arm"], r["period"]): r["mean_y"] for r in rows}
    assert set(cells) == {
        ("control", "pre"),
        ("control", "post"),
        ("treatment", "pre"),
        ("treatment", "post"),
    }
    did = {r["did_estimate"] for r in rows}
    assert len(did) == 1
    expected = round(
        (cells[("treatment", "post")] - cells[("treatment", "pre")])
        - (cells[("control", "post")] - cells[("control", "pre")]),
        4,
    )
    assert abs(did.pop() - expected) < 1e-9  # composes from the rounded means


def test_raking_matches_source_margin_and_improves_lang_margin(spark):
    rows = CATALOG["raking_ipf_weights"].build(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    total = len(docs)
    langs = {d["lang"] for d in docs}
    sources = {d["source"] for d in docs}
    src_target = total / len(sources)
    # last IPF step scaled columns: source margins match the target
    by_src: dict = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0.0) + (
            r["n_docs"] * r["raking_weight"]
        )
    for s, mass in by_src.items():
        assert abs(mass - src_target) / src_target < 0.01
    # language margins moved toward uniform vs the raw counts
    lang_target = total / len(langs)
    raw: dict = {}
    for d in docs:
        raw[d["lang"]] = raw.get(d["lang"], 0) + 1
    seen = {r["lang"]: r["lang_margin_after"] for r in rows}
    raw_dev = sum(abs(raw[lg] - lang_target) for lg in langs)
    new_dev = sum(abs(seen[lg] - lang_target) for lg in langs)
    assert new_dev < raw_dev
    for r in rows:
        assert r["raking_weight"] > 0
