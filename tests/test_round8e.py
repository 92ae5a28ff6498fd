"""Semantic properties of the round-8 continuation batch 3
(plans/round8e.py); oracle parity is covered by preflight.py."""

from __future__ import annotations

import math

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# sax_daily_volume_symbols
# ---------------------------------------------------------------------------


def test_sax_symbols_partition_days_and_quantize_correctly(spark):
    rows = (
        CATALOG["sax_daily_volume_symbols"].build(spark, SF_DIR)
        .orderBy("seg_idx")
        .collect()
    )
    assert rows
    n_days_total = sum(r["n_days"] for r in rows)
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    distinct_days = ev.select(F.to_date("ts")).distinct().count()
    assert n_days_total == distinct_days  # segments partition the day grid
    bp = (-0.6745, 0.0, 0.6745)
    for r in rows:
        z, sym = r["paa_z"], r["symbol"]
        if z < bp[0] - 1e-9:
            assert sym == "a"
        elif bp[0] + 1e-9 < z < bp[1] - 1e-9:
            assert sym == "b"
        elif bp[1] + 1e-9 < z < bp[2] - 1e-9:
            assert sym == "c"
        elif z > bp[2] + 1e-9:
            assert sym == "d"
    # the 3-symbol motif ramps in after two segments
    assert rows[0]["word3"] is None
    if len(rows) >= 3:
        assert rows[2]["word3"] == rows[0]["symbol"] + rows[1]["symbol"] + rows[2]["symbol"]


# ---------------------------------------------------------------------------
# ks_source_bh_fdr
# ---------------------------------------------------------------------------


def test_bh_fdr_is_a_step_up_procedure(spark):
    rows = (
        CATALOG["ks_source_bh_fdr"].build(spark, SF_DIR).orderBy("p_rank").collect()
    )
    assert rows
    m = len(rows)
    prev_p = 0.0
    kstar = 0
    for r in rows:
        assert 0.0 <= r["ks_d"] <= 1.0
        assert 0.0 <= r["p_value"] <= 1.0
        assert r["p_value"] >= prev_p - 1e-9  # ranked ascending
        prev_p = r["p_value"]
        assert abs(r["bh_critical"] - r["p_rank"] * 0.05 / m) < 1e-6
        if r["p_value"] <= r["p_rank"] * 0.05 / m + 1e-12:
            kstar = r["p_rank"]
    for r in rows:
        # step-up: EVERYTHING at or below k* is rejected, even rows whose
        # own p exceeds their critical value
        assert r["rejected"] == (r["p_rank"] <= kstar)


# ---------------------------------------------------------------------------
# association_rule_directed
# ---------------------------------------------------------------------------


def test_association_rule_identities(spark):
    rows = CATALOG["association_rule_directed"].build(spark, SF_DIR).collect()
    assert rows
    confs = [r["confidence"] for r in rows]
    assert confs == sorted(confs, reverse=True)
    for r in rows:
        assert 0.0 < r["confidence"] <= 1.0
        assert r["lift"] > 0.0
        # leverage and lift agree in direction: lift > 1 <=> leverage > 0
        if r["lift"] > 1.0 + 1e-9:
            assert r["leverage"] > 0.0
        if r["lift"] < 1.0 - 1e-9:
            assert r["leverage"] < 0.0
        if r["confidence"] >= 1.0 - 1e-12:
            assert r["conviction"] is None  # rule never fails -> infinite
        elif r["conviction"] is not None:
            assert r["conviction"] > 0.0


# ---------------------------------------------------------------------------
# dedup_community_modularity
# ---------------------------------------------------------------------------


def test_modularity_identities(spark):
    rows = CATALOG["dedup_community_modularity"].build(spark, SF_DIR).collect()
    if not rows:  # sf0.001 may produce no LSH candidate pairs
        return
    mod = rows[0]["modularity"]
    assert all(abs(r["modularity"] - mod) < 1e-12 for r in rows)  # constant col
    assert -0.5 <= mod <= 1.0  # Newman-Girvan bounds
    total_q = sum(r["q_contribution"] for r in rows)
    assert abs(total_q - mod) < 1e-3  # contributions sum to the total (4dp edges)
    m2 = sum(r["degree_sum"] for r in rows)  # sum of degrees = directed edges
    for r in rows:
        assert r["internal_directed_edges"] <= r["degree_sum"]
        assert r["community_size"] >= 1
        expect = r["internal_directed_edges"] / m2 - (r["degree_sum"] / m2) ** 2
        assert abs(r["q_contribution"] - expect) < 1e-5
