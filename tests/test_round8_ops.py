"""Semantic properties of the round-8 data-selection / two-stage-ANN
operators (oracle parity is covered by test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_dsir_target_slice_scores_higher_on_average(spark):
    """The whole point of DSIR: documents FROM the target slice must be
    rated more target-like than the rest on average."""
    w = CATALOG["dsir_importance_weights"].build(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )
    joined = w.join(docs, "doc_id")
    means = (
        joined.groupBy(F.col("source") == "src0")
        .agg(F.avg("dsir_logw").alias("m"))
        .collect()
    )
    by_flag = {r[0]: r["m"] for r in means}
    assert by_flag[True] > by_flag[False]


def test_dsir_covers_every_multiword_doc(spark):
    w = CATALOG["dsir_importance_weights"].build(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_multi = docs.filter(F.size(F.split("text", " ")) >= 2).count()
    assert w.count() == n_multi
    assert w.filter(F.col("n_bigrams") < 1).count() == 0


def test_ccnet_buckets_are_ordered_within_language(spark):
    """head <= middle <= tail in cross-entropy, per language, and the
    three buckets partition each language's docs."""
    b = CATALOG["ccnet_perplexity_buckets"].build(spark, SF_DIR)
    rows = (
        b.groupBy("lang", "ppl_bucket")
        .agg(
            F.min("cross_entropy_bits").alias("lo"),
            F.max("cross_entropy_bits").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    per_lang: dict[str, dict[str, tuple[float, float, int]]] = {}
    for r in rows:
        per_lang.setdefault(r["lang"], {})[r["ppl_bucket"]] = (
            r["lo"], r["hi"], r["n"],
        )
    for lang, buckets in per_lang.items():
        assert set(buckets) <= {"head", "middle", "tail"}, lang
        if "head" in buckets and "tail" in buckets:
            assert buckets["head"][1] <= buckets["tail"][0], lang
        if "head" in buckets and "middle" in buckets:
            assert buckets["head"][1] <= buckets["middle"][0], lang
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_multi = docs.filter(F.size(F.split(F.lower("text"), " ")) >= 2).count()
    assert b.count() == n_multi


def test_chunk_dedup_conserves_distinct_chunks(spark):
    """Every distinct chunk digest keeps exactly one owner: the kept
    chunk count across the corpus equals the distinct digest count, and
    no doc keeps more chunks than it has."""
    r = CATALOG["chunk_dedup_reconstruct"].build(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    chunks = docs.select(F.split("text", " ").alias("w")).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(w), 16),"
                " s -> array_join(slice(w, s, 16), ' '))"
            )
        ).alias("chunk")
    )
    n_distinct = chunks.select("chunk").distinct().count()
    agg = r.agg(F.sum("n_kept").alias("k"), F.sum("n_chunks").alias("t")).first()
    assert agg["k"] == n_distinct
    assert r.filter(F.col("n_kept") > F.col("n_chunks")).count() == 0
    assert r.count() == docs.count()


def test_chunk_dedup_reconstruction_matches_kept_count(spark):
    """A doc's reconstruction is word-consistent: empty iff n_kept = 0,
    and a doc whose chunks are all kept reproduces its original text."""
    r = CATALOG["chunk_dedup_reconstruct"].build(spark, SF_DIR)
    assert (
        r.filter(
            (F.col("n_kept") == 0) != (F.length("dedup_text") == 0)
        ).count()
        == 0
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    full = r.filter(F.col("n_kept") == F.col("n_chunks")).join(docs, "doc_id")
    assert full.count() > 0
    assert full.filter(F.col("dedup_text") != F.col("text")).count() == 0


def test_rerank_orders_exact_distance_within_shortlist(spark):
    res = CATALOG["ann_ivfpq_rerank_exact"].build(spark, SF_DIR).collect()
    assert len(res) == 5 * 10
    by_query: dict[int, list] = {}
    for row in res:
        by_query.setdefault(row["query_id"], []).append(row)
    for qid, rows in by_query.items():
        rows.sort(key=lambda r: r["rank"])
        dists = [r["l2_dist"] for r in rows]
        assert dists == sorted(dists), qid
        assert all(1 <= r["adc_rank"] <= 50 for r in rows), qid
        assert [r["rank"] for r in rows] == list(range(1, 11)), qid


def test_ndcg_bounded_and_consistent(spark):
    res = CATALOG["ndcg_at_k_eval"].build(spark, SF_DIR).collect()
    assert len(res) == 5
    for r in res:
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9, r
        assert r["dcg"] <= r["idcg"] + 1e-9, r
        assert abs(r["ndcg"] - round(r["dcg"] / r["idcg"], 5)) <= 1e-4, r


def test_t_closeness_bounded_and_covers_classes(spark):
    res = CATALOG["t_closeness_audit"].build(spark, SF_DIR)
    customers = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    n_classes = (
        customers.select("c_nationkey", "c_mktsegment").distinct().count()
    )
    rows = res.collect()
    assert len(rows) == n_classes
    for r in rows:
        assert 0.0 <= r["t_emd"] <= 1.0 + 1e-9, r
    assert sum(r["n"] for r in rows) == customers.count()


def test_funnel_chains_and_decreases(spark):
    rows = sorted(
        CATALOG["filter_funnel_attrition"].build(spark, SF_DIR).collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [r["stage"] for r in rows] == [
        "length", "repetition", "language", "exact_dedup",
    ]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert rows[0]["docs_in"] == docs
    for prev, cur in zip(rows, rows[1:]):
        assert cur["docs_in"] == prev["docs_out"]
    for r in rows:
        assert 0 <= r["docs_out"] <= r["docs_in"]


def test_rendezvous_single_shard_movement(spark):
    """THE rendezvous property: dropping shard 15 moves ONLY the docs
    that were assigned to shard 15; everyone else keeps their shard."""
    from citibike_deep_dive_spark.plans.round8 import hrw_shard_expr

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    both = docs.select(
        "doc_id",
        F.expr(hrw_shard_expr(16)).alias("s16"),
        F.expr(hrw_shard_expr(15)).alias("s15"),
    )
    moved_but_not_from_dropped = both.filter(
        (F.col("s16") != 15) & (F.col("s16") != F.col("s15"))
    ).count()
    assert moved_but_not_from_dropped == 0
    # and the dropped shard's docs land somewhere valid
    assert both.filter((F.col("s16") == 15) & (F.col("s15") > 14)).count() == 0


def test_rendezvous_counts_partition_the_corpus(spark):
    res = CATALOG["shard_assignment_rendezvous"].build(spark, SF_DIR)
    total = res.agg(F.sum("n_docs")).first()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert total == docs


def test_label_propagation_communities_refine_components(spark):
    """Every LPA community sits inside ONE connected component (labels
    only travel along edges), and community labels are member doc_ids."""
    from citibike_deep_dive_spark.operators.dedup import (
        connected_components,
        label_propagation,
        lsh_candidate_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = lsh_candidate_pairs(docs, k=4, rows_per_band=2)
    lpa = label_propagation(pairs)
    cc = connected_components(pairs)
    joined = lpa.join(cc, "doc_id")
    # community -> must map to exactly one component
    n_bad = (
        joined.groupBy("community")
        .agg(F.countDistinct("cluster_id").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert n_bad == 0
    # label values are node ids of the graph
    node_ids = {r["doc_id"] for r in lpa.select("doc_id").collect()}
    for r in lpa.select("community").distinct().collect():
        assert r["community"] in node_ids


def test_dsir_resample_prefers_high_weight_docs(spark):
    """The resample must skew toward high-importance docs: the sample's
    mean log-weight sits far above the population mean (weights spread
    >> Gumbel noise scale at this corpus), is exactly k rows, and the
    key decomposes as logw + hash-seeded Gumbel."""
    res = CATALOG["dsir_importance_resample"].build(spark, SF_DIR).collect()
    assert len(res) == 100
    w = CATALOG["dsir_importance_weights"].build(spark, SF_DIR)
    pop_mean = w.agg(F.avg("dsir_logw")).first()[0]
    sample_mean = sum(r["dsir_logw"] for r in res) / len(res)
    assert sample_mean > pop_mean
    # deterministic replay: a second build yields the identical sample
    res2 = CATALOG["dsir_importance_resample"].build(spark, SF_DIR).collect()
    assert {r["doc_id"] for r in res} == {r["doc_id"] for r in res2}


def test_phrase_search_hits_are_real_occurrences(spark):
    """Every reported (phrase, doc, pos) is verifiable against the raw
    text, and only the top-2 phrases appear."""
    rows = CATALOG["phrase_search_positional"].build(spark, SF_DIR).collect()
    assert rows
    phrases = {r["phrase"] for r in rows}
    assert len(phrases) <= 2
    texts = {
        r["doc_id"]: r["text"].lower().split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for r in rows:
        w = texts[r["doc_id"]]
        pos = int(r["pos"])
        assert " ".join(w[pos:pos + 3]) == r["phrase"], r


def test_span_corruption_is_nonoverlapping_and_verifiable(spark):
    """Spans stay inside their 20-word segment (so they never overlap),
    and the masked tokens match the document at the planned offsets."""
    rows = CATALOG["span_corruption_masks"].build(spark, SF_DIR).collect()
    assert rows
    texts = {
        r["doc_id"]: r["text"].lower().split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, spans in by_doc.items():
        w = texts[doc_id]
        for r in spans:
            s = int(r["span_start"])  # 1-based
            seg = r["sentinel_id"]
            assert seg * 20 + 1 <= s <= seg * 20 + 18, r
            assert r["span_len"] == 3
            assert " ".join(w[s - 1:s + 2]) == r["masked_tokens"], r
        starts = sorted(int(r["span_start"]) for r in spans)
        for a, b in zip(starts, starts[1:]):
            assert b >= a + 3  # non-overlap


def test_bpe_apply_merges_reduces_tokens_and_reconstructs(spark):
    """After 3 merge rounds: every word's tokens concatenate back to
    the word, total tokens strictly drop vs character count (some merge
    fired), and no token crosses a word boundary."""
    rows = CATALOG["bpe_apply_merges"].build(spark, SF_DIR).collect()
    assert rows
    total_chars = sum(len(r["word"]) * r["freq"] for r in rows)
    total_tokens = sum(r["n_tokens"] * r["freq"] for r in rows)
    assert total_tokens < total_chars
    for r in rows:
        assert "".join(r["tokens"].split("|")) == r["word"], r
        assert r["n_tokens"] == len(r["tokens"].split("|")), r


def test_suffix_prefix_overlap_finds_constructed_splits(spark, tmp_path):
    """A document split mid-stream with a 4-word overlap is found as a
    (head, tail) pair; unrelated docs are not."""
    from citibike_deep_dive_spark.plans import CATALOG as _CAT

    words = [f"w{i}" for i in range(40)]
    head = " ".join(words[:22])          # ends with w18..w21
    tail = " ".join(words[18:40])        # starts with w18..w21
    other = " ".join(f"x{i}" for i in range(30))
    df = spark.createDataFrame(
        [(0, head, "en", "s", len(head)),
         (1, tail, "en", "s", len(tail)),
         (2, other, "en", "s", len(other))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "docs")
    df.write.parquet(f"{path}/documents.parquet")
    res = CATALOG["dedup_suffix_prefix_overlap"].build(spark, path).collect()
    pairs = {(r["head_doc"], r["tail_doc"]) for r in res}
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_suffix_prefix_overlap_nonvacuous_on_testdata(spark):
    """The demo edge width yields real matches on the shipped corpus
    (guards against a silently-empty oracle comparison at sf0.01)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    n = con.execute(
        f"SELECT count(*) FROM ({CATALOG['dedup_suffix_prefix_overlap'].oracle})"
    ).fetchone()[0]
    assert n > 0


def test_label_propagation_releases_caches(spark):
    """VERDICT r11 item 6 (persist-lifecycle audit): a rebuilt query
    must not grow the storage tab. label_propagation caches its edge
    frame and seed labels; without the r12 release path the
    CacheManager holds both FOREVER (GC never reclaims explicit
    persists), so every rebuild in a sweep/bench leaked two frames."""
    import gc
    import time

    from citibike_deep_dive_spark.plans import CATALOG

    def settled_count() -> int:
        # localCheckpoint blocks are reclaimed asynchronously once the
        # Python/JVM references die — settle GC before counting so only
        # UNRELEASABLE entries (the leak class) remain
        prev = None
        for _ in range(20):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            cur = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
            if prev is not None and cur == prev:
                return cur
            prev = cur
        return prev

    def build_once() -> None:
        CATALOG["dedup_label_propagation"].build(
            spark, "/root/testdata/sf0.001"
        ).collect()

    build_once()
    after_first = settled_count()
    build_once()
    after_second = settled_count()
    assert after_second <= after_first, (
        f"storage tab grew across rebuilds: {after_first} -> {after_second}"
    )
