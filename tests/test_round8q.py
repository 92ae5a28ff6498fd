"""Semantic properties of the round-8 continuation batch 15
(plans/round8q.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

from collections import Counter, defaultdict

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"

_STOPS = {"the", "a", "of", "and", "is"}


def test_rake_matches_python(spark):
    rows = CATALOG["rake_keyphrases"].build(spark, SF_DIR).collect()
    assert len(rows) == 15
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    phrases = []
    for d in docs:
        cur = []
        for w in d["text"].lower().split(" "):
            if w in _STOPS:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    freq: Counter = Counter()
    deg: Counter = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    s_mu = {w: int(round(1e6 * deg[w] / freq[w])) for w in freq}
    scored: dict = defaultdict(lambda: [0, 0])
    for p in phrases:
        txt = " ".join(p)
        scored[txt][0] += 1
        scored[txt][1] = sum(s_mu[w] for w in p)
    top = sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0]))[:15]
    got = sorted(rows, key=lambda r: r["rank"])
    for (txt, (n_occ, mu)), r in zip(top, got):
        assert r["phrase"] == txt
        assert r["n_occurrences"] == n_occ
        assert abs(r["rake_score"] - mu / 1e6) < 1e-3
    # multi-word phrases should surface (that's RAKE's whole point)
    assert any(" " in r["phrase"] for r in rows)


def test_ransac_consensus_properties(spark):
    rows = CATALOG["ransac_trend_consensus"].build(spark, SF_DIR).collect()
    assert len(rows) == 5
    ranked = sorted(rows, key=lambda r: r["rank"])
    counts = [r["n_inliers"] for r in ranked]
    assert counts == sorted(counts, reverse=True)
    # recompute the winner's inlier count in python
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily: dict = {}
    for e in ev:
        d = e["ts"].date()
        daily[d] = daily.get(d, 0) + int(round(e["value"] * 100))
    y = [daily[d] for d in sorted(daily)]
    yr = max(y) - min(y)
    tau = yr // 10
    best = ranked[0]
    i, j = best["day_i"], best["day_j"]
    dx, dy = j - i, y[j] - y[i]
    inliers = sum(
        1
        for x, v in enumerate(y)
        if abs((v - y[i]) * dx - dy * (x - i)) <= tau * abs(dx)
    )
    assert best["n_inliers"] == inliers
    assert abs(best["inlier_frac"] - round(inliers / len(y), 4)) < 1e-9
    assert abs(best["slope_per_day"] - round(dy / (dx * 100.0), 4)) < 1e-9
