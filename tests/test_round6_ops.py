"""Semantic tests for the round-6 additions (cross-engine value equality
is covered by the driver oracle / preflight; these pin invariants the
hash check can't express)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from citibike_deep_dive_spark.plans import CATALOG

SF = "/root/testdata/sf0.001"


def test_k_anonymity_partitions_the_table(spark):
    rows = CATALOG["k_anonymity_audit"].build(spark, SF).collect()
    total = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r.n_rows for r in rows) == total
    assert all(r.n_classes * r.k_size == r.n_rows for r in rows)


def test_cusum_changepoint_one_row_per_type(spark):
    rows = CATALOG["cusum_changepoint"].build(spark, SF).collect()
    types = {r.event_type for r in rows}
    assert len(rows) == len(types)
    assert all(r.max_cusum >= 0 for r in rows)


def test_markov_stationary_is_a_distribution(spark):
    rows = CATALOG["markov_stationary_power"].build(spark, SF).collect()
    assert rows, "states must exist"
    # mass is conserved by a stochastic matrix: sums to 1 up to rounding
    assert abs(sum(r.stationary_p for r in rows) - 1.0) < 1e-6
    assert all(r.stationary_p > 0 for r in rows)


def test_lsh_tuning_metrics_are_consistent(spark):
    r = CATALOG["lsh_tuning_report"].build(spark, SF).collect()[0]
    assert r.n_hit <= r.n_true and r.n_hit <= r.n_pred
    assert 0.0 <= r.recall <= 1.0 and 0.0 <= r.precision <= 1.0


def test_anova_f_nonnegative_and_counts(spark):
    r = CATALOG["anova_f_by_group"].build(spark, SF).collect()[0]
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert r.n_tot == n_events
    assert r.f_stat >= 0 and r.ss_between >= 0 and r.ss_within >= 0


def test_chi2_grid_covers_all_combos(spark):
    r = CATALOG["chi2_lang_source"].build(spark, SF).collect()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_lang = docs.select("lang").distinct().count()
    n_src = docs.select("source").distinct().count()
    assert r.n_cells == n_lang * n_src
    assert r.dof == (n_lang - 1) * (n_src - 1)
    assert r.chi2 >= 0


def test_gini_split_partitions_corpus(spark):
    r = CATALOG["gini_split_scan"].build(spark, SF).collect()[0]
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert r.n_left + r.n_right == total
    assert 0.0 <= r.gini <= 0.5


def test_mutual_knn_pairs_are_reciprocal_and_cell_local(spark):
    rows = CATALOG["mutual_knn_pairs"].build(spark, SF).collect()
    emb = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    for r in rows:
        assert r.id_a < r.id_b
        assert emb[r.id_a] == emb[r.id_b] == r.label
        assert -1.0001 <= r.cos_sim <= 1.0001


def test_dup_discount_bounded_by_raw(spark):
    rows = CATALOG["dup_discounted_tokens"].build(spark, SF).collect()
    for r in rows:
        assert 0 < r.discounted_tokens <= r.raw_tokens + 1e-9


def test_kfold_assignment_is_deterministic_and_complete(spark):
    df = CATALOG["stratified_kfold_balance"].build(spark, SF)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, CATALOG["stratified_kfold_balance"].build(spark, SF).collect()))
    assert a == b  # content-hash folds: stable across builds
    rows = df.collect()
    assert {r.fold for r in rows} <= set(range(5))
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == total


def test_zipf_fit_slope_is_negative(spark):
    r = CATALOG["vocab_zipf_fit"].build(spark, SF).collect()[0]
    assert r.slope < 0  # frequency must fall with rank
    assert 0.0 <= r.r2 <= 1.0
    assert r.n_terms <= 1000


def test_new_queries_have_oracles_and_audit_clean(spark):
    names = [
        "k_anonymity_audit", "cusum_changepoint", "markov_stationary_power",
        "lsh_tuning_report", "anova_f_by_group", "chi2_lang_source",
        "gini_split_scan", "mutual_knn_pairs", "dup_discounted_tokens",
        "stratified_kfold_balance", "vocab_zipf_fit",
    ]
    for n in names:
        assert CATALOG[n].oracle, n


@pytest.mark.parametrize("name", ["gini_split_scan", "vocab_zipf_fit"])
def test_bounded_topk_plans(spark, name):
    """The global orderings in these plans must be k-bounded (top-k) or
    metadata-scale (bucket histogram) — never a full global sort."""
    plan = (
        CATALOG[name]
        .build(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Sort [" not in plan or "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan


def test_simhash64_pairs_symmetric_and_bounded(spark):
    rows = CATALOG["simhash64_hamming_pairs"].build(spark, SF).collect()
    assert rows, "near-dup docs exist in the fixture corpus"
    for r in rows:
        assert r.doc_id_a < r.doc_id_b
        assert 0 <= r.hamming <= 3


def test_simhash_wide_band_values_fit_width(spark):
    from citibike_deep_dive_spark.operators.dedup import simhash_wide

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = simhash_wide(docs, band_bits=16, n_bands=4).collect()
    for r in rows:
        for b in range(4):
            assert 0 <= r[f"sh{b}"] < (1 << 16)


def test_l_diversity_partitions_and_bounds(spark):
    rows = CATALOG["l_diversity_audit"].build(spark, SF).collect()
    total = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r.n_rows for r in rows) == total
    for r in rows:
        assert 1 <= r.l_distinct
        assert r.min_k >= r.l_distinct  # can't have more distinct values than rows


def test_rfm_covers_all_customers_with_valid_bands(spark):
    rows = CATALOG["rfm_segmentation"].build(spark, SF).collect()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_seg <= 4 and 1 <= r.f_seg <= 4 and 1 <= r.m_seg <= 4


def test_wav_header_parser_rejects_garbage_and_roundtrips():
    from citibike_deep_dive_spark.operators.multimodal import parse_wav_header

    assert parse_wav_header(b"") is None
    assert parse_wav_header(b"RIFFxxxxNOPE" + b"\0" * 40) is None
    assert parse_wav_header(b"x" * 44) is None
    # hand-built canonical header: stereo, 16 kHz, 16-bit, 64000-byte data
    hdr = (
        b"RIFF" + (36 + 64000).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + (16000).to_bytes(4, "little")
        + (64000).to_bytes(4, "little") + (4).to_bytes(2, "little")
        + (16).to_bytes(2, "little") + b"data" + (64000).to_bytes(4, "little")
    )
    assert parse_wav_header(hdr) == (2, 16000, 16, 1000)
    # zero byte-rate must not divide by zero
    bad = bytearray(hdr)
    bad[24:28] = (0).to_bytes(4, "little")
    assert parse_wav_header(bytes(bad)) is None


def test_audio_metadata_keeps_undecodable_rows(spark):
    from pyspark.sql import types as T

    from citibike_deep_dive_spark.operators.multimodal import audio_metadata

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    rows = [(1, b"not a wav at all"), (2, None)]
    out = {r.media_id: r for r in
           audio_metadata(spark.createDataFrame(rows, schema)).collect()}
    assert set(out) == {1, 2}
    assert out[1].channels is None and out[2].duration_ms is None


def test_simhash_wide_band0_equals_16bit_simhash(spark):
    """Bit j (j<32) of the wide fingerprint is defined as bit 0 of md5
    hex digit j — for j<16 that's exactly the 16-bit simhash's bit
    definition, so band 0 of the wide form must reproduce the original
    fingerprint bit-for-bit (cross-implementation consistency)."""
    from citibike_deep_dive_spark.operators.dedup import simhash, simhash_wide

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    narrow = {r.doc_id: r.simhash for r in simhash(docs, bits=16).collect()}
    wide = {r.doc_id: r.sh0 for r in
            simhash_wide(docs, band_bits=16, n_bands=4).collect()}
    assert narrow == wide


def test_ewma_bounded_by_observed_range(spark):
    rows = CATALOG["ewma_daily_volume"].build(spark, SF).collect()
    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in daily.groupBy("event_type")
        .agg(F.min("n").alias("lo"), F.max("n").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = bounds[r.event_type]
        # a weighted average of daily counts lies within their range
        assert lo <= r.ewma_volume <= hi
        assert 1 <= r.n_days_used <= 30


def test_fd_audit_true_key_has_zero_violations(spark):
    rows = {r.fd: r for r in
            CATALOG["functional_dependency_audit"].build(spark, SF).collect()}
    assert rows["orders: orderkey -> custkey"].n_violating == 0
    assert rows["customer: name -> custkey"].violation_rate == 0.0
    for r in rows.values():
        assert 0 <= r.n_violating <= r.n_groups
        assert 0.0 <= r.violation_rate <= 1.0


def test_dup_histogram_partitions_corpus(spark):
    rows = CATALOG["dup_cluster_size_histogram"].build(spark, SF).collect()
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == total
    assert all(r.n_clusters * r.csize == r.n_docs for r in rows)


def test_conflicting_label_summary_bounds(spark):
    r = CATALOG["conflicting_label_duplicates"].build(spark, SF).collect()[0]
    assert 0 <= r.lang_conflict_clusters <= r.n_dup_clusters
    assert 0 <= r.cross_source_clusters <= r.n_dup_clusters
    if r.n_dup_clusters:
        assert 0.0 <= r.lang_conflict_rate <= 1.0
