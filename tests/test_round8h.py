"""Semantic properties of the round-8 continuation batch 6
(plans/round8h.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math
from collections import Counter

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_kn_heldout_perplexity_identities(spark):
    rows = CATALOG["kneser_ney_heldout_perplexity"].build(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert 0.0 <= r["unseen_bigram_rate"] <= 1.0
        assert r["mean_bits"] > 0.0
        # perplexity = 2^mean_bits
        assert abs(r["perplexity"] - 2 ** r["mean_bits"]) < 1e-2 * r["perplexity"]
        # bigram model over a finite vocab: ppl can't exceed the event space
        assert r["perplexity"] < 10**6


def test_kn_heldout_sees_some_oov_on_split(spark):
    rows = CATALOG["kneser_ney_heldout_perplexity"].build(spark, SF_DIR).collect()
    # a genuine held-out split on a finite corpus should expose at least
    # one source to at least one unseen bigram (else the split is vacuous)
    assert any(r["unseen_bigram_rate"] > 0.0 for r in rows)


def test_brier_decomposition_identity(spark):
    [r] = CATALOG["brier_murphy_decomposition"].build(spark, SF_DIR).collect()
    assert 0.0 <= r["base_rate"] <= 1.0
    assert r["reliability"] >= 0.0
    assert r["resolution"] >= 0.0
    assert abs(r["uncertainty"] - r["base_rate"] * (1 - r["base_rate"])) < 1e-5
    # Murphy identity at bin grain
    assert (
        abs(r["brier_binned"] - (r["reliability"] - r["resolution"] + r["uncertainty"]))
        < 1e-5
    )
    # raw Brier = binned + within-bin variance, and the variance is >= 0
    assert abs(r["brier_raw"] - r["brier_binned"] - r["within_bin_variance"]) < 1e-5
    assert r["within_bin_variance"] >= -1e-9
    # resolution can never exceed uncertainty
    assert r["resolution"] <= r["uncertainty"] + 1e-9
    assert 0.0 <= r["brier_raw"] <= 1.0


def test_brier_raw_matches_python(spark):
    [r] = CATALOG["brier_murphy_decomposition"].build(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    num = 0
    for d in docs:
        ws = d["text"].lower().split(" ")
        s_m = round(len(set(ws)) / len(ws) * 1e6)
        pos = 1 if d["n_chars"] >= 160 else 0
        num += (s_m - pos * 10**6) ** 2
    assert abs(r["brier_raw"] - num / (len(docs) * 1e12)) < 1e-5


def test_rolling_median_matches_python(spark):
    rows = CATALOG["rolling_median_daily_volume"].build(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily = Counter(e["ts"].date() for e in ev)
    got = {r["day"]: r for r in rows}
    assert len(got) == len(daily)
    from datetime import timedelta

    for day, c in daily.items():
        vals = sorted(
            daily[d]
            for d in daily
            if day - timedelta(days=6) <= d <= day
        )
        n = len(vals)
        med = (vals[(n + 1) // 2 - 1] + vals[(n + 2) // 2 - 1]) / 2
        r = got[day.isoformat()]
        assert r["c_today"] == c
        assert r["n_in_window"] == n
        assert abs(r["rolling_median"] - round(med, 1)) < 1e-9
