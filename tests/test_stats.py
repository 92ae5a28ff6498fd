"""functions/stats.py: histogram_median must match Spark's exact median
aggregate on every parity class the rank arithmetic can get wrong."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from citibike_deep_dive_spark.functions.stats import histogram_median


def _check(spark, rows):
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r.g: r.med
        for r in histogram_median(df, "g", "v", out="med").collect()
    }
    want = {
        r.g: r.med
        for r in df.groupBy("g").agg(F.median("v").alias("med")).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])


def test_histogram_median_parity_classes(spark):
    """Odd n (middle value), even n with distinct middles (their mean),
    even n with a duplicate value spanning both middle ranks, and a
    singleton group."""
    _check(
        spark,
        [
            # odd: median = 2
            ("odd", 1.0), ("odd", 2.0), ("odd", 3.0),
            # even, distinct middles: median = 2.5
            ("even", 1.0), ("even", 2.0), ("even", 3.0), ("even", 4.0),
            # even, duplicate spans both middle ranks: median = 7
            ("dup", 5.0), ("dup", 7.0), ("dup", 7.0), ("dup", 9.0),
            # singleton
            ("one", 42.0),
        ],
    )


def test_histogram_median_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "g string, v double"
    )
    got = histogram_median(df, "g", "v", out="med").collect()
    assert len(got) == 1 and abs(got[0].med - 2.0) < 1e-12


def test_histogram_median_all_null_group_contract(spark):
    """Pinned contract: a key whose values are ALL NULL emits NO row
    (its histogram is empty) — unlike F.median, which keeps the group
    with a null median. Callers needing aggregate parity LEFT-join, as
    moment_aggregates does; the left join restores the group with a
    null median exactly."""
    df = spark.createDataFrame(
        [("live", 1.0), ("live", 3.0), ("ghost", None), ("ghost", None)],
        "g string, v double",
    )
    med = histogram_median(df, "g", "v", out="med")
    assert {r.g for r in med.collect()} == {"live"}  # ghost dropped

    # the documented caller pattern: left-join onto the full key set
    restored = {
        r.g: r.med
        for r in df.select("g").distinct().join(med, "g", "left").collect()
    }
    want = {
        r.g: r.med
        for r in df.groupBy("g").agg(F.median("v").alias("med")).collect()
    }
    assert restored.keys() == want.keys() == {"live", "ghost"}
    assert restored["ghost"] is None and want["ghost"] is None
    assert abs(restored["live"] - want["live"]) < 1e-12


def test_histogram_median_randomized(spark):
    rng = random.Random(7)
    rows = [
        (rng.choice("abc"), float(rng.randint(0, 30)))
        for _ in range(500)
    ]
    _check(spark, rows)
