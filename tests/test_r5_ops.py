"""Round-5 additions: prefix-filter exact Jaccard join (lossless-bound
boundary cases), BM25 scoring, inverted-index build, compaction planning."""

from __future__ import annotations

from pyspark.sql import functions as F

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_prefix_filter_jaccard_boundary(spark):
    """Exact-threshold pair (J = 0.6 precisely) must be found — the ceil
    in the prefix length is integer-exact, so the lossless bound holds at
    the boundary; a just-below pair must be excluded."""
    from citibike_deep_dive_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    # A and B share exactly 6 of 10 distinct trigram shingles -> J = 0.6.
    # C shares 5 of 11 with A -> J ~ 0.4545, excluded.
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "a b c d e f g h x y"),
            (3, "a b c d e f g x y z"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(docs, 3, 5).collect()
    }
    assert (1, 2) in rows and abs(rows[(1, 2)] - 0.6) < 1e-9
    assert (1, 3) not in rows


def test_prefix_filter_equals_brute_force(spark):
    """Prefix filtering is lossless: result must equal the all-pairs
    brute force at the same threshold (in-Spark check; the DuckDB oracle
    repeats this cross-engine)."""
    from citibike_deep_dive_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
        shingle_frame,
    )
    from citibike_deep_dive_spark.plans.catalog import table

    docs = table(spark, SF_DIR, "documents")
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(docs, 3, 5).collect()
    )

    sh = shingle_frame(docs)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - inter
    ).cast("double")
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jac", jac)
        .filter(F.col("jac") >= 0.6)
        .select("id_a", "id_b", F.round("jac", 4).alias("jaccard"))
    )
    want = sorted((r.id_a, r.id_b, r.jaccard) for r in brute.collect())
    assert got == want
    assert got  # sf0.001 corpus does contain near-dup pairs


def test_prefix_filter_filters_lossless_randomized(spark):
    """Adversarial check of the PPJoin length + positional filters: many
    short docs over an 8-word vocabulary (maximal shingle collisions and
    length spread — the regime where an off-by-one in the overlap bound
    alpha or the rank inequality would over-prune), three thresholds,
    exact equality with the all-pairs brute force each time."""
    import random

    from citibike_deep_dive_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
        shingle_frame,
    )

    rng = random.Random(20260814)
    vocab = list("abcdefgh")
    rows = []
    for i in range(0, 60, 2):
        base = [rng.choice(vocab) for _ in range(rng.randint(3, 12))]
        # even ids: the base doc; odd ids: a light perturbation of it
        # (append/replace one word) so every threshold has true pairs at
        # assorted lengths, not just the trivially identical ones
        rows.append((i, " ".join(base)))
        mut = list(base)
        if rng.random() < 0.5:
            mut.append(rng.choice(vocab))
        else:
            mut[rng.randrange(len(mut))] = rng.choice(vocab)
        rows.append((i + 1, " ".join(mut)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingle_frame(docs)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - inter
    ).cast("double")
    for t_num, t_den in ((1, 2), (3, 5), (4, 5)):
        got = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in prefix_filter_jaccard_pairs(docs, t_num, t_den).collect()
        )
        brute = (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("jac", jac)
            .filter(F.col("jac") >= F.lit(t_num) / F.lit(t_den))
            .select("id_a", "id_b", F.round("jac", 4).alias("jaccard"))
        )
        want = sorted((r.id_a, r.id_b, r.jaccard) for r in brute.collect())
        assert got == want, f"mismatch at t={t_num}/{t_den}"
        assert got, f"degenerate fixture at t={t_num}/{t_den}"


def test_bm25_monotone_in_tf(spark):
    """More occurrences of a query term -> higher BM25, same doc length
    (idf and length normalization fixed across the pair)."""
    import citibike_deep_dive_spark.plans.training as tr

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler filler"),
            (2, "spark filler filler filler filler filler"),
            (3, "filler filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    docs = docs.select("doc_id", F.split(F.lower("text"), " ").alias("w"))
    stats = docs.agg(
        F.count("*").cast("double").alias("n"),
        F.avg(F.size("w")).alias("avgdl"),
        *[
            F.sum(F.array_contains("w", t).cast("int")).alias(f"df_{i}")
            for i, t in enumerate(tr._BM25_TERMS)
        ],
    )
    per_doc = docs.select(
        "doc_id",
        F.size("w").cast("double").alias("dl"),
        *[
            F.expr(f"size(filter(w, x -> x = '{t}'))").alias(f"tf_{i}")
            for i, t in enumerate(tr._BM25_TERMS)
        ],
    )
    # reuse the catalog's scoring expression by running the registered
    # query on a temp view is heavier; recompute with the same constants
    n, avgdl = F.col("n"), F.col("avgdl")
    score = None
    for i in range(len(tr._BM25_TERMS)):
        tf, dfc = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(F.lit(1.0) + (n - dfc + 0.5) / (dfc + 0.5))
        part = idf * (
            (tf * (tr._BM25_K1 + 1.0))
            / (tf + tr._BM25_K1 * (1.0 - tr._BM25_B + tr._BM25_B * F.col("dl") / avgdl))
        )
        score = part if score is None else score + part
    got = {
        r.doc_id: r.s
        for r in per_doc.join(F.broadcast(stats)).select(
            "doc_id", score.alias("s")
        ).collect()
    }
    assert got[1] > got[2] > got[3] == 0.0


def test_inverted_index_tiebreak_and_counts(spark):
    """df/cf bookkeeping and the deterministic head posting: equal tf
    resolves to the SMALLER doc_id (max(struct(tf, -doc_id)))."""
    rows = CATALOG["inverted_index_postings"].build(spark, SF_DIR).collect()
    assert rows
    by_tok = {r.token: r for r in rows}
    for r in rows:
        assert r.cf >= r.df >= 1
        assert r.top_tf >= 1
    # cross-check one token against a direct computation
    from citibike_deep_dive_spark.plans.catalog import table

    docs = table(spark, SF_DIR, "documents")
    tok = next(iter(by_tok))
    tf = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .filter(F.col("t") == tok)
        .groupBy("doc_id")
        .count()
        .collect()
    )
    best = sorted(((-r["count"], r.doc_id) for r in tf))[0]
    assert by_tok[tok].top_doc_id == best[1]
    assert by_tok[tok].top_tf == -best[0]
    assert by_tok[tok].df == len(tf)
    assert by_tok[tok].cf == sum(r["count"] for r in tf)


def test_pq_codes_shape_and_range(spark):
    """PQ assignment: 8 sub-codes per vector, codes in [0, 16), and the
    recorded sub-distance is the true minimum over the deterministic
    codebook (spot-checked by recomputing one row in Python)."""
    rows = CATALOG["embedding_pq_codes"].build(spark, SF_DIR).collect()
    n_vecs = len({r.vec_id for r in rows})
    assert len(rows) == 8 * n_vecs
    assert all(0 <= r.code < 16 for r in rows)
    # recompute row (vec 0, sub 0) directly
    from citibike_deep_dive_spark.plans.catalog import table

    emb = (
        table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") == rows[0].vec_id)
        .first()
        .embedding
    )
    sub_id = 0
    dists = []
    for c in range(16):
        d = 0.0
        for j in range(1, 9):
            cent = ((sub_id * 16 + c) * 8 + j) * 1103515245 + 12345
            cent = cent % 65536 / 32768.0 - 1.0
            d += (float(emb[sub_id * 8 + j - 1]) - cent) ** 2
        dists.append(d)
    want_code = dists.index(min(dists))
    got = next(r for r in rows if r.vec_id == rows[0].vec_id and r.sub_id == 0)
    assert got.code == want_code
    assert abs(got.sub_dist - min(dists)) < 1e-9


def test_compaction_plan_invariants(spark):
    """Within each returnflag family: cumulative bytes strictly increase,
    target_file ids are non-decreasing, and every planned output file
    except possibly the last crosses the target size."""
    import citibike_deep_dive_spark.plans.scalepath as sp

    rows = CATALOG["compaction_bin_packing"].build(spark, SF_DIR).collect()
    assert rows
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(r)
    for flag, rs in by_flag.items():
        rs.sort(key=lambda r: r.ship_month)
        cum = 0
        prev_bucket = -1
        for r in rs:
            cum += r.bytes
            assert r.cum_bytes == cum
            assert r.target_file == (cum - 1) // sp._COMPACT_TARGET
            assert r.target_file >= prev_bucket
            prev_bucket = r.target_file


def _plan_str(spark, name):
    return (
        CATALOG[name].build(spark, SF_DIR)._jdf.queryExecution()
        .executedPlan().toString()
    )


def test_bpe_pairs_from_distinct_words(spark):
    """The pair explosion must run over the distinct-word dict, not the
    corpus: a word occurring N times contributes its pairs with weight N
    but is exploded ONCE. Pinned behaviorally — a word repeated across
    docs yields pair_count = freq, and the plan aggregates words before
    the pair explode."""
    from citibike_deep_dive_spark.plans.training import bpe_merge_candidates

    plan = _plan_str(spark, "bpe_merge_candidates")
    # generate/explode of pairs must sit ABOVE the word-frequency
    # aggregate in the plan (explode after the first HashAggregate pair).
    gen_pos = plan.index("Generate explode")
    agg_pos = len(plan) - plan[::-1].index(
        "HashAggregate"[::-1]
    )  # last HashAggregate occurrence end
    assert "Generate explode" in plan and "TakeOrderedAndProject" in plan
    assert gen_pos < agg_pos, plan[:3000]


def test_semdedup_keeps_lower_cos_to_rep(spark):
    """For a near-dup pair, the member with the LOWER cosine to the
    cluster representative survives; the other is pruned. Vectors with
    no near-dup partner are never pruned."""
    from citibike_deep_dive_spark.operators.similarity import (
        embedding_cosine_near_dups,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0], 7),      # rep of cluster 7
            (1, [0.9, 0.1, 0.0], 7),      # near-dup of 2, closer to rep
            (2, [0.88, 0.12, 0.01], 7),   # near-dup of 1
            (3, [0.0, 1.0, 0.0], 7),      # orthogonal — no partner
        ],
        "vec_id long, embedding array<double>, label int",
    )
    emb.createOrReplaceTempView("semdedup_fixture")
    pairs = embedding_cosine_near_dups(emb, threshold=0.99)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    # rep cosine: vec 1 is closer to rep (higher cos) than vec 2
    # -> SemDeDup prunes vec 1, keeps vec 2.
    from pyspark.sql import functions as F  # noqa: F401
    from citibike_deep_dive_spark.operators.similarity import cosine

    s = emb.alias("e").join(
        emb.filter("vec_id = 0").select(
            F.col("label").alias("l2"), F.col("embedding").alias("rep")
        ),
        F.col("label") == F.col("l2"),
    ).select("vec_id", F.round(cosine(F.col("e.embedding"), F.col("rep")), 4).alias("c"))
    cs = {r.vec_id: r.c for r in s.collect()}
    assert cs[1] > cs[2]


def test_simhash_banding_is_lossless(spark):
    """Pigeonhole guarantee: 4 bands x 4 bits finds EVERY pair with
    hamming <= 3 — banded output must equal the brute-force all-pairs
    filter on the same simhashes."""
    from citibike_deep_dive_spark.operators.dedup import simhash

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    )
    sh = simhash(docs, bits=16)
    a = sh.select(F.col("doc_id").alias("ida"), F.col("simhash").alias("sa"))
    b = sh.select(F.col("doc_id").alias("idb"), F.col("simhash").alias("sb"))
    brute = {
        (r.ida, r.idb)
        for r in a.join(b, F.col("ida") < F.col("idb"))
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
        .collect()
    }
    sub = docs.count()
    got_all = CATALOG["simhash_hamming_pairs"].build(spark, SF_DIR)
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in got_all.collect()
        if r.doc_id_a in ids and r.doc_id_b in ids
    }
    assert sub == 80 and brute == got


def test_ohlc_single_aggregate_no_window(spark):
    """The OHLC bar must be ONE hash aggregate (struct-extremum
    argmin/argmax) — a window-based first/last would add a partition
    sort per bar key."""
    plan = _plan_str(spark, "ohlc_resample_daily")
    assert "Window" not in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2500]


def test_ohlc_open_close_semantics(spark):
    """open = value at earliest (ts, event_id); close = at latest."""
    from citibike_deep_dive_spark.plans import CATALOG as C

    df = C["ohlc_resample_daily"].build(spark, "/root/testdata/sf0.001")
    row = df.filter("n_events >= 3").first()
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("event_type") == row.event_type)
        .filter(F.date_format(F.to_date("ts"), "yyyy-MM-dd") == row.day_str)
        .orderBy("ts", "event_id")
        .collect()
    )
    assert row.open == ev[0].value and row.close == ev[-1].value
    vals = [r.value for r in ev]
    assert row.high == max(vals) and row.low == min(vals)


def test_hard_negative_mining_excludes_near_dups_and_self(spark):
    """Band semantics: no self-pairs, no cos >= upper bound (near-dup
    false negatives), no cos < lower bound, at most k per anchor, rank
    dense from 1."""
    df = CATALOG["hard_negative_mining"].build(spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert rows, "band must be non-empty at sf0.01"
    per = {}
    for r in rows:
        assert r.query_id != r.cand_id
        assert 0.15 <= r.cos_sim < 0.45
        per.setdefault(r.query_id, []).append(r.rank)
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_hard_negative_window_is_group_limited(spark):
    plan = _plan_str(spark, "hard_negative_mining")
    assert "WindowGroupLimit" in plan, plan[:2500]


def test_resize_images_geometry_and_plumbing(spark):
    """Aspect-preserving fit: never upscale, never distort (scale equal
    on both axes), 1px floor, binary payload round-trips through Arrow."""
    from citibike_deep_dive_spark.operators.multimodal import (
        resize_images, synthesize_media,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = resize_images(synthesize_media(docs), 224, 224).collect()
    assert out, "image rows must exist"
    for r in out:
        assert 1 <= r.dst_width <= max(224, r.src_width)
        assert 1 <= r.dst_height <= max(224, r.src_height)
        assert r.scale <= 1.0
        if r.src_width > 224 or r.src_height > 224:
            assert r.dst_width <= 224 and r.dst_height <= 224
        assert isinstance(r.payload, (bytes, bytearray)) and len(r.payload) >= 16


def test_resize_images_skips_null_and_zero_meta(spark):
    """Rows whose header parse failed (null meta dims) are filtered in
    the PLAN, not crashed on in pandas; a 0-dim row clips to the 1px
    floor instead of producing an inf scale."""
    from pyspark.sql import types as T

    from citibike_deep_dive_spark.operators.multimodal import resize_images

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_duration_ms", T.IntegerType()),
    ])
    rows = [
        (1, "image", b"x" * 32, None, 480, 0),   # failed header parse
        (2, "image", b"y" * 32, 640, None, 0),   # failed header parse
        (3, "image", b"z" * 32, 0, 480, 0),      # degenerate 0-width
        (4, "image", b"w" * 32, 640, 480, 0),    # normal
        (5, "audio", b"a" * 32, None, None, 99), # wrong kind, null meta
    ]
    out = {r.media_id: r for r in
           resize_images(spark.createDataFrame(rows, schema), 224, 224).collect()}
    assert set(out) == {3, 4}
    assert out[3].src_width == 1 and out[3].scale <= 1.0
    assert out[4].dst_width == 224


def test_resize_stub_gates_without_fake():
    import pytest as _pytest
    from citibike_deep_dive_spark.operators.multimodal import resize_stub

    with _pytest.raises(NotImplementedError):
        resize_stub(b"abc", 10, 10, deterministic_fake=False)


def test_welch_t_matches_scipy_free_reference(spark):
    """Cross-check the decimal-exact Welch t against a plain-Python
    two-pass computation on the same rows (no scipy in the container)."""
    import math

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", (F.col("user_id") % 2).alias("v"), "value")
        .collect()
    )
    by = {}
    for r in rows:
        by.setdefault((r.event_type, r.v), []).append(r.value)
    df = CATALOG["ab_test_welch_t"].build(spark, SF_DIR)
    for r in df.collect():
        a, b = by[(r.event_type, 0)], by[(r.event_type, 1)]
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
        vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
        t = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
        assert abs(r.t_stat - t) < 1e-4, (r.event_type, r.t_stat, t)
        assert r.n_a == len(a) and r.n_b == len(b)
