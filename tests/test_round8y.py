"""Semantic properties of the round-8 continuation batch 23
(plans/round8y.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from datetime import timedelta

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_logrank_python_recompute(spark):
    rows = CATALOG["logrank_churn_arms"].build(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user: dict = {}
    horizon = max(e["ts"] for e in ev)
    for e in ev:
        u = by_user.setdefault(e["user_id"], [e["ts"], e["ts"]])
        u[0] = min(u[0], e["ts"])
        u[1] = max(u[1], e["ts"])
    spans = []
    for uid, (mn, mx) in by_user.items():
        grp = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2
        dur = (mx.date() - mn.date()).days
        churned = int(mx < horizon - timedelta(days=1))
        spans.append((grp, dur, churned))
    times = sorted({d for _, d, _ in spans})
    n = [sum(1 for g, _, _ in spans if g == k) for k in (0, 1)]
    exited = [Counter(), Counter()]
    deaths = [Counter(), Counter()]
    for g, d, c in spans:
        exited[g][d] += 1
        deaths[g][d] += c
    o0 = e0_mu = v_mu = n_times = 0
    at_risk = [n[0], n[1]]
    for t in times:
        n0, n1 = at_risk
        d0, d1 = deaths[0][t], deaths[1][t]
        if d0 + d1 > 0 and n0 > 0 and n1 > 0:
            nn, dd = n0 + n1, d0 + d1
            o0 += d0
            e0_mu += int(round(1e6 * dd * n0 / nn))
            if nn > 1:
                v_mu += int(
                    round(1e6 * dd * (n0 / nn) * (n1 / nn) * (nn - dd) / (nn - 1))
                )
            n_times += 1
        at_risk[0] -= exited[0][t]
        at_risk[1] -= exited[1][t]
    assert r["n_times"] == n_times
    assert r["observed_0"] == o0
    assert abs(r["expected_0"] - round(e0_mu / 1e6, 4)) < 1e-9
    chi2 = (o0 - e0_mu / 1e6) ** 2 / (v_mu / 1e6)
    assert abs(r["logrank_chi2"] - round(chi2, 4)) < 1e-9
    # A/A on a random hash split: chi2 should not be astronomically large
    assert r["logrank_chi2"] < 30


def test_ppmi_skipgram_python_recompute(spark):
    rows = CATALOG["ppmi_skipgram_pairs"].build(spark, SF_DIR).collect()
    assert len(rows) == 25
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    pc: Counter = Counter()
    uc: Counter = Counter()
    total = 0
    for d in docs:
        ws = d["text"].lower().split(" ")
        for i, w in enumerate(ws):
            for o in (1, 2, 3):
                if i + o < len(ws):
                    a, b = sorted((w, ws[i + o]))
                    pc[(a, b)] += 1
                    uc[a] += 1
                    uc[b] += 1
                    total += 1
    n = 2 * total
    scored = {}
    for (a, b), c in pc.items():
        if c >= 5:
            ppmi = max(0.0, math.log2(2 * c * n / (uc[a] * uc[b])))
            scored[(a, b)] = (round(ppmi, 5), c)
    top = sorted(scored.items(), key=lambda kv: (-kv[1][0], kv[0]))[:25]
    got = sorted(rows, key=lambda r: r["rank"])
    for ((a, b), (ppmi, c)), r in zip(top, got):
        assert (r["w1"], r["w2"]) == (a, b)
        assert r["pair_count"] == c
        assert abs(r["ppmi"] - ppmi) < 1e-9
    # skip-gram sees pairs adjacent PMI cannot: at least one top pair
    # must have a window-2+ co-occurrence contribution (pair_count
    # exceeding its adjacent-bigram count)
    adj: Counter = Counter()
    for d in docs:
        ws = d["text"].lower().split(" ")
        for x, y in zip(ws, ws[1:]):
            adj[tuple(sorted((x, y)))] += 1
    assert any(r["pair_count"] > adj[(r["w1"], r["w2"])] for r in got)
