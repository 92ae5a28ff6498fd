"""Semantic properties of the round-8 continuation batch 16
(plans/round8r.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_sinkhorn_plan_properties(spark):
    rows = CATALOG["sinkhorn_transport_plan"].build(spark, SF_DIR).collect()
    assert rows
    ranked = sorted(rows, key=lambda r: r["rank"])
    masses = [r["plan_mass"] for r in ranked]
    assert masses == sorted(masses, reverse=True)
    costs = {r["transport_cost"] for r in rows}
    assert len(costs) == 1
    cost = costs.pop()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    xa = [d["n_chars"] for d in docs if d["source"] == "src0"]
    xb = [d["n_chars"] for d in docs if d["source"] == "src1"]
    # the entropic cost lies between 0 and the max possible move
    assert 0.0 <= cost <= max(abs(a - b) for a in xa for b in xb)
    # after two rounds the plan approximately couples the marginals:
    # total reported mass <= 1 and every cell mass is positive
    for r in rows:
        assert r["plan_mass"] >= 0
        assert r["cost"] == abs(r["len_a"] - r["len_b"])
    assert sum(masses) <= 1.0 + 1e-6
    # one-point sanity: exact entropic OT in python for the same recipe
    import math

    eps = 50.0
    from collections import Counter

    ca, cb = Counter(xa), Counter(xb)
    xs, ys = sorted(ca), sorted(cb)
    n0, n1 = len(xa), len(xb)
    K = {(x, y): math.exp(-abs(x - y) / eps) for x in xs for y in ys}
    d1 = {y: sum(int(round(1e9 * K[(x, y)])) for x in xs) for y in ys}
    v = {y: int(round(cb[y] * 1e18 / (n1 * d1[y]))) for y in ys}
    s1 = {x: sum(int(round(K[(x, y)] * v[y])) for y in ys) for x in xs}
    u = {x: int(round(ca[x] * 1e18 / (n0 * s1[x]))) for x in xs}
    d2 = {y: sum(int(round(K[(x, y)] * u[x])) for x in xs) for y in ys}
    v2 = {y: int(round(cb[y] * 1e18 / (n1 * d2[y]))) for y in ys}
    s2 = {x: sum(int(round(K[(x, y)] * v2[y])) for y in ys) for x in xs}
    u2 = {x: int(round(ca[x] * 1e18 / (n0 * s2[x]))) for x in xs}
    p = {
        (x, y): int(round(u2[x] * K[(x, y)] * v2[y] / 1e18 * 1e9))
        for x in xs
        for y in ys
    }
    top = sorted(p.items(), key=lambda kv: (-kv[1], kv[0]))[: len(ranked)]
    for ((x, y), mu), r in zip(top, ranked):
        assert (r["len_a"], r["len_b"]) == (x, y)
        assert abs(r["plan_mass"] - mu / 1e9) < 6e-7  # published at 6dp
    exp_cost = sum(mu * abs(x - y) for (x, y), mu in p.items()) / 1e9
    assert abs(cost - exp_cost) < 1e-3


def test_shrinkage_pulls_small_sources_harder(spark):
    rows = CATALOG["beta_binomial_shrinkage"].build(spark, SF_DIR).collect()
    assert rows
    g = rows[0]["grand_rate"]
    alpha, beta = rows[0]["alpha"], rows[0]["beta"]
    assert alpha > 0 and beta > 0
    for r in rows:
        # shrunk rate lies between the raw rate and the grand rate
        lo, hi = sorted((r["raw_rate"], g))
        assert lo - 1e-4 <= r["shrunk_rate"] <= hi + 1e-4
        expected = (r["en_docs"] + alpha) / (r["n_docs"] + alpha + beta)
        assert abs(r["shrunk_rate"] - round(expected, 6)) < 1e-5
    # the moved fraction follows the theory: (alpha+beta)/(n+alpha+beta)
    for r in rows:
        if abs(r["raw_rate"] - g) > 0.01:
            frac = abs(r["shrunk_rate"] - r["raw_rate"]) / abs(r["raw_rate"] - g)
            theory = (alpha + beta) / (r["n_docs"] + alpha + beta)
            assert abs(frac - theory) < 5e-3
