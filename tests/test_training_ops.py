from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from citibike_deep_dive_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from citibike_deep_dive_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    synthesize_media,
)
from citibike_deep_dive_spark.operators.similarity import brute_force_topk, ivf_topk


def docs_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup
        (3, "the quick brown fox jumps over the lazy cat", "en"),  # near dup
        (4, "completely different words entirely unrelated text here", "en"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_dedup_groups(spark):
    out = {r.keeper_doc_id: r.dup_count for r in exact_dedup(docs_df(spark)).collect()}
    assert out[1] == 2  # docs 1+2 identical, keeper is min id
    assert out[3] == 1
    assert out[4] == 1


def test_minhash_identical_and_near(spark):
    sigs = {r.doc_id: (r.sig0, r.sig1, r.sig2, r.sig3)
            for r in minhash_signatures(docs_df(spark)).collect()}
    assert sigs[1] == sigs[2]  # identical docs -> identical signature
    # near-dup shares most shingles -> at least one matching component
    assert any(a == b for a, b in zip(sigs[1], sigs[3]))
    # unrelated doc shares nothing
    assert all(a != b for a, b in zip(sigs[1], sigs[4]))


def test_lsh_and_jaccard(spark):
    docs = docs_df(spark)
    pairs = lsh_candidate_pairs(docs)
    got = {(r.doc_id_a, r.doc_id_b) for r in pairs.collect()}
    assert (1, 2) in got  # exact dups always bucket together
    jac = {(r.doc_id_a, r.doc_id_b): r.jaccard
           for r in ngram_jaccard_pairs(docs, pairs).collect()}
    assert jac[(1, 2)] == 1.0
    for pair, j in jac.items():
        assert 0.0 <= j <= 1.0


def test_simhash_similarity_ordering(spark):
    out = {r.doc_id: r.simhash for r in simhash(docs_df(spark)).collect()}
    assert out[1] == out[2]  # identical docs -> identical fingerprint

    def hamming(a, b):
        return bin(a ^ b).count("1")

    # near-dup closer in hamming space than unrelated doc
    assert hamming(out[1], out[3]) < hamming(out[1], out[4])


def test_simhash_lane3_vote_overflow(spark):
    """Regression: a doc with >= 2^15 distinct tokens that all set a
    lane-3 bit drives the packed vote long NEGATIVE; arithmetic shift +
    sign-following % then produced a negative ones-count and a silently
    wrong fingerprint. Unsigned shift + pmod must match a pure-Python
    oracle of the documented bit definition."""
    import hashlib

    from citibike_deep_dive_spark.operators.dedup import simhash_wide

    # tokens whose md5 hex digit 15 is odd -> narrow bit 15 (lane 3 of
    # packed group 3) is 1 for every token; 33000 > 2^15 ones overflows
    # the old signed unpack. Same condition is wide bit j=15 (also lane 3).
    toks, k = [], 0
    while len(toks) < 33000:
        t = f"w{k}"
        if int(hashlib.md5(t.encode()).hexdigest()[15], 16) & 1:
            toks.append(t)
        k += 1
    n = len(toks)
    hexes = [hashlib.md5(t.encode()).hexdigest() for t in toks]

    def narrow_bit(h, j):  # LSB of hex digit j
        return int(h[j], 16) & 1

    def wide_bit(h, j):  # bit (j//32) of hex digit (j%32)
        return (int(h[j % 32], 16) >> (j // 32)) & 1

    exp_narrow = sum(
        1 << j
        for j in range(16)
        if 2 * sum(narrow_bit(h, j) for h in hexes) - n > 0
    )
    exp_bands = [
        sum(
            1 << r
            for r in range(16)
            if 2 * sum(wide_bit(h, b * 16 + r) for h in hexes) - n > 0
        )
        for b in range(4)
    ]

    docs = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
    [row] = simhash(docs, bits=16).collect()
    assert row.simhash == exp_narrow
    assert row.simhash & (1 << 15)  # the overflowing bit is unanimously 1
    [wrow] = simhash_wide(docs, band_bits=16, n_bands=4).collect()
    assert [wrow.sh0, wrow.sh1, wrow.sh2, wrow.sh3] == exp_bands


def emb_df(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),   # close to 0
        (2, [0.0, 1.0, 0.0], 0),   # orthogonal to 0
        (3, [1.0, 0.05, 0.0], 1),  # close to 0 but a different label
        (4, [0.0, 0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    return df.withColumn("embedding", F.col("embedding").cast("array<float>"))


def test_brute_force_topk_ordering(spark):
    emb = emb_df(spark)
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=2).collect()
    ranked = sorted(out, key=lambda r: r.rank)
    assert [r.cand_id for r in ranked] == [3, 1]  # cos: 3≈0.9988 > 1≈0.9939
    assert ranked[0].cos_sim > ranked[1].cos_sim


def test_ivf_restricts_to_cell(spark):
    emb = emb_df(spark)
    out = ivf_topk(emb, emb.filter(F.col("vec_id") == 0), k=5).collect()
    # label-0 cell only: candidates 1 and 2; 3 excluded despite high cosine
    assert sorted(r.cand_id for r in out) == [1, 2]


def test_multimodal_stub_and_features(spark):
    with pytest.raises(NotImplementedError):
        decode_stub(b"bytes", "image")

    docs = docs_df(spark).withColumn("n_chars", F.length("text"))
    media = synthesize_media(docs)
    kinds = {r.media_id: r.kind for r in media.collect()}
    assert set(kinds.values()) <= {"image", "audio", "video"}

    feats = extract_features(media).collect()
    assert len(feats) == 4
    for r in feats:
        assert len(r.features) == 8
        assert all(0.0 <= v <= 1.0 for v in r.features)
    # identical payloads -> identical digests and features
    by_id = {r.media_id: r for r in feats}
    assert by_id[1].digest == by_id[2].digest
    assert by_id[1].features == by_id[2].features


def test_salted_aggregate_matches_plain(spark):
    from citibike_deep_dive_spark.operators.skew import salted_aggregate

    df = spark.range(0, 1000).selectExpr(
        "CAST(id % 3 AS STRING) AS k", "id AS v"
    )
    got = {
        r.k: (r.n, r.v_sum, r.v_min, r.v_max)
        for r in salted_aggregate(
            df,
            keys=["k"],
            aggs=[("count", "*", "n"), ("sum", "v", "v_sum"),
                  ("min", "v", "v_min"), ("max", "v", "v_max")],
            salt_buckets=8,
        ).collect()
    }
    from pyspark.sql import functions as F

    want = {
        r.k: (r.n, r.v_sum, r.v_min, r.v_max)
        for r in df.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("v").alias("v_sum"),
            F.min("v").alias("v_min"), F.max("v").alias("v_max")
        ).collect()
    }
    assert got == want


def test_salted_aggregate_rejects_nondecomposable(spark):
    from citibike_deep_dive_spark.operators.skew import salted_aggregate

    df = spark.range(10).selectExpr("CAST(id AS STRING) AS k", "id AS v")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_aggregate(df, ["k"], [("avg", "v", "a")])


def test_sign_lsh_bucket_groups_identical_vectors(spark):
    from pyspark.sql import functions as F
    from citibike_deep_dive_spark.operators.similarity import (
        embedding_near_dups_sign_lsh,
        sign_lsh_bucket,
    )

    rows = [
        (1, [0.5, -0.2, 0.1, 0.9]),
        (2, [0.5, -0.2, 0.1, 0.9]),   # identical -> same bucket, cos=1
        (3, [0.51, -0.19, 0.12, 0.88]),  # near-dup, same signs
        (4, [-0.5, 0.2, -0.1, -0.9]),  # opposite signs -> other bucket
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    buckets = {
        r.vec_id: r.b
        for r in df.select("vec_id", sign_lsh_bucket(F.col("embedding"), 4).alias("b")).collect()
    }
    assert buckets[1] == buckets[2] == buckets[3]
    assert buckets[4] != buckets[1]

    pairs = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_near_dups_sign_lsh(df, threshold=0.9, bits=4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs
    assert all(4 not in p for p in pairs)


def test_connected_components_transitive(spark):
    from citibike_deep_dive_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)], ["doc_id_a", "doc_id_b"]
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    # {1,2,3,9} one cluster (transitively), {5,6} another
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_asof_join_semantics(spark):
    from datetime import datetime
    from citibike_deep_dive_spark.operators.asof import asof_join

    t = lambda s: datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [(1, "u1", t("2024-01-01 10:00:00")),
         (2, "u1", t("2024-01-01 12:00:00")),
         (3, "u2", t("2024-01-01 09:00:00"))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [("u1", t("2024-01-01 09:30:00"), 10.0),
         ("u1", t("2024-01-01 11:00:00"), 20.0),
         ("u1", t("2024-01-01 12:00:00"), 30.0),  # equal ts visible (<=)
         ("u2", t("2024-01-01 09:30:00"), 99.0)],  # after u2's event
        ["user_id", "ts", "v"],
    )
    got = {r.event_id: r.v for r in asof_join(left, right, on="ts", by=["user_id"]).collect()}
    assert got == {1: 10.0, 2: 30.0, 3: None}


def test_hash_split_stable_and_disjoint(spark):
    from citibike_deep_dive_spark.operators.sampling import (
        deterministic_sample,
        train_val_test_split,
    )

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s1 = set(r.doc_id for r in deterministic_sample(df, "doc_id", 0.2).collect())
    s2 = set(
        r.doc_id
        for r in deterministic_sample(df.repartition(7), "doc_id", 0.2).collect()
    )
    assert s1 == s2, "sample must be partition-layout independent"
    assert 0.15 < len(s1) / 5000 < 0.25

    split = train_val_test_split(df, "doc_id")
    counts = {r.split: r.n for r in split.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # growing the corpus never moves an existing row's split
    bigger = train_val_test_split(
        spark.range(0, 10000).withColumnRenamed("id", "doc_id"), "doc_id"
    )
    small_map = {r.doc_id: r.split for r in split.collect()}
    big_map = {r.doc_id: r.split for r in bigger.collect()}
    assert all(big_map[k] == v for k, v in small_map.items())


def test_kmeans_separates_obvious_clusters(spark):
    from citibike_deep_dive_spark.operators.similarity import ivf_assign, kmeans

    # two tight blobs around (0,0,...) and (10,10,...)
    rows = [(i, [0.0 + i * 0.01] * 8) for i in range(10)] + [
        (100 + i, [10.0 + i * 0.01] * 8) for i in range(10)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    centroids = kmeans(emb, k=2, iters=3)
    assert centroids.count() == 2
    cells = {r.vec_id: r.cell for r in ivf_assign(emb, centroids).collect()}
    low = {cells[i] for i in range(10)}
    high = {cells[100 + i] for i in range(10)}
    assert len(low) == 1 and len(high) == 1 and low != high


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from citibike_deep_dive_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(i % 5, float(i)) for i in range(200)], ["k", "v"]
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(7)], ["sk", "name"])
    plain = (
        big.join(small, big.k == small.sk)
        .groupBy("name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    salted = (
        salted_join(big, small, "k", "sk", salt_buckets=4)
        .groupBy("name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_sketch_aggregates_bounded_error(spark):
    # r5: the error bound moved INTO the query output as a boolean column
    # (each engine asserts its own sketch vs its own exact — the
    # value-checked oracle contract). Both Spark sketches are
    # deterministic for fixed input, so pin the boolean at BOTH sf dirs
    # the driver touches (smoke sf0.001, correctness sf0.01).
    from citibike_deep_dive_spark.plans.catalog import CATALOG

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        hll = CATALOG["approx_distinct_hll"].build(spark, sf_dir).collect()
        assert hll
        assert all(r.approx_within_5pct == 1 for r in hll), sf_dir
        assert all(r.exact_users > 0 for r in hll)

        q = CATALOG["approx_quantiles_sketch"].build(spark, sf_dir).collect()
        assert len(q) == 3 * len(hll)  # 3 percentiles per event_type
        assert all(r.approx_in_band == 1 for r in q), sf_dir
        for r in q:
            assert r.p in (0.5, 0.9, 0.99)


def test_zorder_buckets_bound_both_dims(spark):
    from citibike_deep_dive_spark.plans.catalog import CATALOG
    from tests.conftest import SF_DIR as sf_dir

    rows = CATALOG["zorder_clustering_buckets"].build(spark, sf_dir).collect()
    assert rows
    # bucket = morton >> 6 fixes all but the low 6 interleaved bits, i.e.
    # 3 low bits of x and 3 of y — so every bucket's bounding box is at
    # most 8 wide in BOTH dimensions. This is the pruning guarantee a
    # single-column sort cannot give.
    for r in rows:
        assert r.max_x - r.min_x < 8
        assert r.max_y - r.min_y < 8


def test_pii_redaction_removes_all_matches(spark):
    from citibike_deep_dive_spark.plans.catalog import CATALOG
    from tests.conftest import SF_DIR as sf_dir

    df = CATALOG["pii_redaction"].build(spark, sf_dir)
    rows = df.collect()
    assert rows and all(r.n_emails >= 1 and r.n_phones >= 1 for r in rows)
    assert all("@" not in r.redacted and "<EMAIL>" in r.redacted for r in rows)


def test_equi_depth_histogram_no_global_sort(spark):
    """VERDICT r1: the ntile form pinned the whole table on one reducer.
    The rewritten plan must contain no Window and no single-partition
    global sort — only the broadcast of the 1-row boundary aggregate."""
    from citibike_deep_dive_spark.plans.catalog import CATALOG

    df = CATALOG["equi_depth_histogram"].build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:2000]
    assert "rangepartitioning" not in plan.lower(), plan[:2000]
    counts = {r.bucket: r.n for r in df.collect()}
    assert sorted(counts) == list(range(1, 11))
    total = sum(counts.values())
    # equi-depth: every bucket within a few rows of total/10
    assert all(abs(n - total / 10) <= max(2, total * 0.02) for n in counts.values())


def test_parse_image_dimensions_all_formats():
    """Real header decode from handcrafted bytes — no codec libs."""
    from citibike_deep_dive_spark.operators.multimodal import parse_image_dimensions

    png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
    )
    assert parse_image_dimensions(png) == ("png", 640, 480)

    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\xf7\x00\x00"
    assert parse_image_dimensions(gif) == ("gif", 320, 200)

    # JPEG: SOI, APP0 segment, then SOF0 with height=600 width=800
    # length field counts itself + payload: 16 = 2 (len) + 14 payload bytes
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (600).to_bytes(2, "big") + (800).to_bytes(2, "big") + b"\x03"
    )
    assert parse_image_dimensions(b"\xff\xd8" + app0 + sof0) == ("jpeg", 800, 600)

    bmp = b"BM" + b"\x00" * 16 + (1024).to_bytes(4, "little") + (-768).to_bytes(4, "little", signed=True)
    assert parse_image_dimensions(bmp) == ("bmp", 1024, 768)  # top-down BMP: |height|

    assert parse_image_dimensions(b"not an image at all") is None
    assert parse_image_dimensions(b"") is None


def test_image_dimensions_operator(spark):
    from citibike_deep_dive_spark.operators.multimodal import image_dimensions

    png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + (99).to_bytes(4, "big") + (77).to_bytes(4, "big")
    )
    media = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"garbage"))], "media_id long, payload binary"
    )
    rows = {r.media_id: r for r in image_dimensions(media).collect()}
    assert (rows[1].fmt, rows[1].width, rows[1].height) == ("png", 99, 77)
    assert rows[2].fmt is None and rows[2].width is None


# --- corpus-level cross-set ops (operators/corpus.py) ----------------------


def test_decontamination_flags_only_overlapping_docs(spark):
    from citibike_deep_dive_spark.operators.corpus import benchmark_decontaminate

    rows = [
        (0, "alpha beta gamma delta epsilon"),          # benchmark (0 % 29 == 0)
        (1, "zzz alpha beta gamma yyy"),                # shares shingle "alpha beta gamma"
        (2, "totally unrelated words in this doc"),     # clean
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.contaminated_grams for r in benchmark_decontaminate(docs).collect()}
    assert got == {1: 1}


def test_incremental_exact_drops_known_digests(spark):
    from citibike_deep_dive_spark.operators.corpus import incremental_exact_survivors

    rows = [
        (1, "existing corpus doc one"),
        (2, "existing corpus doc two"),
        (7, "existing corpus doc one"),   # new batch, exact dup of corpus
        (17, "a genuinely new document"), # new batch, novel
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    survivors = {r.doc_id for r in incremental_exact_survivors(docs).collect()}
    assert survivors == {17}


def test_incremental_neardup_drops_identical_text(spark):
    from citibike_deep_dive_spark.operators.corpus import incremental_neardup_survivors

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (7, "the quick brown fox jumps over the lazy dog"),       # all bands match doc 1
        (17, "completely different words entirely unrelated text"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    survivors = {r.doc_id for r in incremental_neardup_survivors(docs).collect()}
    assert 7 not in survivors and 17 in survivors


def test_temperature_mix_upsamples_small_sources(spark):
    from citibike_deep_dive_spark.operators.corpus import temperature_mix

    rows = [(i, "x", "big" if i < 90 else "small") for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.source: r for r in temperature_mix(docs).collect()}
    assert abs(out["big"].weight + out["small"].weight - 1.0) < 1e-5
    assert abs(out["big"].token_budget + out["small"].token_budget - 1_000_000) <= 1
    # alpha < 1: the small source gets MORE than its proportional share
    assert out["small"].weight > 10 / 100


def test_vocab_coverage_monotone_and_bounded(spark):
    from citibike_deep_dive_spark.operators.corpus import vocab_coverage

    rows = [(1, "a a a b b c"), (2, "a b c d e f g")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = vocab_coverage(docs, top_k=3).orderBy("rank").collect()
    assert [r.token for r in out] == ["a", "b", "c"]
    cov = [r.coverage for r in out]
    assert cov == sorted(cov) and cov[-1] <= 1.0
    assert abs(cov[-1] - 9 / 13) < 1e-5


def test_dim_covariance_matches_numpy(spark):
    import numpy as np

    from citibike_deep_dive_spark.operators.similarity import dim_covariance

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(50, 16)).astype("float32")
    rows = [(i, [float(x) for x in mat[i]]) for i in range(50)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {(r.i, r.j): r.cov for r in dim_covariance(emb, d=16).collect()}
    expected = np.cov(mat.astype("float64"), rowvar=False, bias=True)
    assert len(got) == 16 * 17 // 2
    for (i, j), v in got.items():
        assert i <= j
        assert abs(v - expected[i, j]) < 1e-4


def test_matryoshka_renorm_is_unit_length(spark):
    from citibike_deep_dive_spark.operators.similarity import matryoshka_renormalize

    rows = [(1, [3.0, 4.0] + [0.0] * 30), (2, [1.0] * 32)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in matryoshka_renormalize(emb, k=16).collect()}
    assert abs(out[1].norm_k - 5.0) < 1e-9
    assert out[1].renorm[:2] == [0.6, 0.8]
    for r in out.values():
        assert abs(sum(x * x for x in r.renorm) - 1.0) < 1e-3


def test_cluster_keepers_picks_highest_quality(spark):
    from citibike_deep_dive_spark.operators.dedup import cluster_keepers

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)], ["doc_id", "cluster_id"]
    )
    quality = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.5), (9, 0.5)],
        ["doc_id", "quality_score"],
    )
    rows = {r.doc_id: r for r in cluster_keepers(comps, quality).collect()}
    # quality tie between 2 and 3 → lower doc_id wins
    assert rows[2].is_keeper == 1 and rows[2].keeper_doc_id == 2
    assert rows[1].is_keeper == 0 and rows[1].keeper_doc_id == 2
    assert rows[3].is_keeper == 0
    # second cluster: tie between 7 and 9 → 7
    assert rows[7].is_keeper == 1 and rows[9].keeper_doc_id == 7


def test_boilerplate_prefix_scrub_strips_frequent_prefix(spark):
    from citibike_deep_dive_spark.operators.textstats import boilerplate_prefix_scrub

    banner = "terms of service apply to all content here"
    rows = [(i, f"{banner} body {i} varies", "web") for i in range(5)]
    rows.append((99, "organic doc with no repeated header at all", "web"))
    rows.append((100, f"{banner} body x varies", "books"))  # other source: only 1×
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.doc_id: r for r in boilerplate_prefix_scrub(docs, width=8, min_docs=5).collect()}
    assert out[0].has_boilerplate == 1
    assert out[0].text_clean == "body 0 varies"  # 8-token prefix stripped
    assert out[99].has_boilerplate == 0
    assert out[99].text_clean == "organic doc with no repeated header at all"
    assert out[100].has_boilerplate == 0  # below threshold in its source


def test_quality_percentile_gate_keeps_top_quartile_per_source(spark):
    from citibike_deep_dive_spark.plans import CATALOG
    df = CATALOG["quality_percentile_gate"].build(spark, "/root/testdata/sf0.001")
    agg = df.groupBy("source").agg(
        F.avg("kept").alias("frac"), F.count("*").alias("n")
    )
    for r in agg.collect():
        # percent_rank >= .75 keeps ~25% (ties can widen slightly)
        assert 0.1 <= r.frac <= 0.45, r


def test_event_transition_matrix_probs_sum_to_one(spark):
    from citibike_deep_dive_spark.plans import CATALOG
    df = CATALOG["event_transition_matrix"].build(spark, "/root/testdata/sf0.001")
    sums = df.groupBy("prev_type").agg(F.sum("prob").alias("p")).collect()
    assert sums, "matrix must be non-empty"
    for r in sums:
        assert abs(r.p - 1.0) < 0.01, r


def test_pagerank_star_hub_ranks_highest_and_sums_to_one(spark):
    from citibike_deep_dive_spark.operators.dedup import pagerank

    # star: 1 is the hub of 2..6, plus a detached pair (8, 9)
    pairs = spark.createDataFrame(
        [(1, i) for i in range(2, 7)] + [(8, 9)], ["doc_id_a", "doc_id_b"]
    )
    rows = {r.doc_id: r.pagerank for r in pagerank(pairs).collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-4
    assert rows[1] > rows[2]  # hub beats satellites
    assert rows[2] == rows[6]  # satellites symmetric
    assert rows[8] == rows[9]


def test_corpus_shuffle_shards_contiguous_and_balanced(spark):
    from citibike_deep_dive_spark.operators.sampling import corpus_shuffle_shards

    df = spark.range(0, 2000).selectExpr("id AS doc_id")
    out = corpus_shuffle_shards(df, key="doc_id", shards=8)
    per = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi")
    ).collect()
    assert len(per) == 8
    for r in per:
        assert r.lo == 1 and r.hi == r.n  # positions contiguous 1..n
        assert 150 <= r.n <= 350  # roughly uniform (2000/8 = 250)
    # deterministic: same input -> same assignment
    again = corpus_shuffle_shards(df, key="doc_id", shards=8)
    assert out.exceptAll(again).count() == 0


def test_value_trend_recovers_known_slope(spark):
    from datetime import datetime, timedelta

    from citibike_deep_dive_spark.plans.training import ols_trend

    base = datetime(2024, 1, 1)
    rows = [("a", base + timedelta(days=i), 3.0 * i + 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    r = ols_trend(df, "event_type", "ts", "value").collect()[0]
    assert r.n == 10
    assert abs(r.slope_per_day - 3.0) < 1e-6
    assert abs(r.intercept - 7.0) < 1e-6
    assert abs(r.r2 - 1.0) < 1e-6
