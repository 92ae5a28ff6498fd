"""Unit tests for the round-4 scale-technique operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from citibike_deep_dive_spark.plans.scalepath import (
    bloom_bitmap,
    bloom_might_contain,
)


def test_bloom_has_no_false_negatives(spark):
    keys = spark.createDataFrame([(i * 7,) for i in range(200)], ["k"])
    words = bloom_bitmap(keys, "k")
    probe = (
        keys.withColumn("__bf", F.lit(words))
        .filter(bloom_might_contain("__bf", "k"))
    )
    # every inserted key must pass the filter
    assert probe.count() == 200


def test_bloom_filters_most_non_members(spark):
    keys = spark.createDataFrame([(i,) for i in range(500)], ["k"])
    words = bloom_bitmap(keys, "k")
    others = spark.createDataFrame(
        [(i,) for i in range(1_000_000, 1_002_000)], ["k"]
    )
    survivors = (
        others.withColumn("__bf", F.lit(words))
        .filter(bloom_might_contain("__bf", "k"))
        .count()
    )
    # m=16384, k=4, n=500 → fp ≈ (1 - e^(-4*500/16384))^4 ≈ 0.02%;
    # allow generous slack — the point is "most", not the exact rate
    assert survivors < 200


def test_bloom_prefilter_stays_in_scan_stage(spark):
    """The membership probe must be a narrow Filter below the join —
    no shuffle, no extra join introduced by the bitmap."""
    from citibike_deep_dive_spark.plans import CATALOG

    df = CATALOG["bloom_prefilter_join"].build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two hash exchanges total: the sketch's own tiny bit_or groupBy (a
    # real, audited plan stage since the lazy rewrite) and the final agg
    # — the bloom PROBE itself must not add one
    assert plan.count("Exchange hashpartitioning") <= 2
    # the probe must sit BELOW the verify join: in the bottom-up plan
    # string the probe filter appears after (deeper than) the semi-join
    assert "xxhash64" in plan
    assert plan.index("xxhash64") > plan.index("BroadcastHashJoin")


def test_bloom_build_is_lazy(spark):
    """Constructing (and explaining) the sketch frame must not launch
    Spark jobs — the sketch is a lazy plan stage, so EXPLAIN-only paths
    (plan_audit, schema checks) stay free. Parquet-footer schema reads
    are the only jobs a full catalog build() may launch, so the check
    targets the sketch over an in-memory frame."""
    from citibike_deep_dive_spark.plans.scalepath import bloom_bitmap_frame

    sc = spark.sparkContext
    keys = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    sc.setJobGroup("bloom-lazy-probe", "laziness check")
    try:
        bf = bloom_bitmap_frame(keys, "k")
        bf.explain(extended=False)
        ids = sc.statusTracker().getJobIdsForGroup("bloom-lazy-probe")
        assert list(ids) == []
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    # and the frame is the documented metadata scale: 1 row, m/64 words
    row = bf.collect()
    assert len(row) == 1 and len(row[0][0]) == 16384 // 64


def test_global_dense_ids_are_contiguous(spark):
    from citibike_deep_dive_spark.plans import CATALOG

    rows = (
        CATALOG["global_dense_ids"]
        .build(spark, "/root/testdata/sf0.001")
        .orderBy("global_id")
        .collect()
    )
    ids = [r.global_id for r in rows]
    assert ids == list(range(len(rows)))
    # dense ids follow doc_id order
    doc_ids = [r.doc_id for r in rows]
    assert doc_ids == sorted(doc_ids)


def test_truncate_lineage_uses_reliable_checkpoint_when_dir_set(
    spark, tmp_path_factory
):
    from citibike_deep_dive_spark.functions.lineage import truncate_lineage

    if spark.sparkContext.getCheckpointDir() is None:
        # no checkpoint dir -> localCheckpoint (plan truncated either way)
        out = truncate_lineage(spark.range(10))
        assert out.count() == 10
        assert "LogicalRDD" in out._jdf.queryExecution().logical().toString()

    # Session-persistent dir (public API only — no py4j reflection, which
    # broke under Spark Connect). There is no public way to UNSET the dir,
    # so it stays set for the rest of the session; later truncate_lineage
    # calls simply take the reliable-checkpoint branch, which is valid.
    ckpt = tmp_path_factory.mktemp("spark-ckpt")
    spark.sparkContext.setCheckpointDir(str(ckpt))
    assert spark.sparkContext.getCheckpointDir() is not None
    out2 = truncate_lineage(spark.range(7))
    assert out2.count() == 7
    assert "LogicalRDD" in out2._jdf.queryExecution().logical().toString()
    # reliable flavor actually wrote checkpoint files
    assert any(ckpt.rglob("*"))


def test_bloom_rejects_non_multiple_of_64_m(spark):
    """A silent word-count mismatch would turn into dropped MATCHING rows
    (NULL probe -> filtered); the build must fail loudly instead."""
    import pytest as _pytest

    from citibike_deep_dive_spark.plans.scalepath import bloom_bitmap_frame

    keys = spark.createDataFrame([(1,)], ["k"])
    for bad_m in (100, 63, 0, -64):
        with _pytest.raises(ValueError):
            bloom_bitmap_frame(keys, "k", m=bad_m)


def test_bitmap_ndv_idiom_matches_count_distinct_with_negatives(spark):
    """The zone-map NDV's bit_or-word idiom (pmod bit index + derived
    floor word) must stay injective across SIGNED keys: the naive
    `key % 64` / `key div 64` form aliases -5 with +59 in word 0
    (sign-following % plus Java's 6-bit shift mask). Random signed keys,
    exact equality with count(DISTINCT)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(42)
    rows = [
        (rng.choice("ab"), rng.randint(-200, 200)) for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "g string, k long")
    words = df.groupBy(
        "g", F.expr("(k - pmod(k, 64)) div 64").alias("w")
    ).agg(F.bit_or(F.expr("shiftleft(1L, cast(pmod(k, 64) as int))")).alias("bits"))
    got = {
        r.g: r.ndv
        for r in words.groupBy("g")
        .agg(F.sum(F.bit_count("bits")).cast("long").alias("ndv"))
        .collect()
    }
    want = {
        r.g: r.ndv
        for r in df.groupBy("g")
        .agg(F.countDistinct("k").alias("ndv"))
        .collect()
    }
    assert got == want
