"""sf1 spot-bench: the 6 heaviest headline queries at 10× data, both
engines same-session (VERDICT r5 item 7).

The driver ships sf0.001/0.01/0.1 only, so the 10× point is derived
from sf0.1 by REPLICATION WITH DECORRELATION — plain replication would
make every replica a near-duplicate of its original and blow the dedup
workloads up quadratically (10 mutual near-dups per doc → ~45× the
candidate pairs), which measures a different problem than "10× more
data of the same character":

- documents: per-replica letter-substitution cipher (``translate`` with
  a rotated alphabet). Bijective on tokens → within-replica duplicate /
  near-duplicate structure is EXACTLY preserved; across replicas every
  shingle/minhash/simhash key is disjoint, so bucket sizes and pair
  counts scale linearly like a real 10× corpus.
- embeddings: per-replica cyclic rotation of the vector (norm-preserving,
  decorrelates cosine across replicas); vec_id shifted by 100k/replica.
- orders: o_orderkey shifted by a multiple of 3 per replica (preserves
  the %3 side-tag distribution of the dock pipeline); o_custkey kept so
  the station dimension stays fixed — trips grow, stations don't,
  matching how the real system scales.

Usage: python bench_sf1.py [--regen]   (writes /tmp/sparkgraft_sf1/)
Prints one JSON line: {"sf1": {query: {"spark": s, "duckdb": s}}, ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from citibike_deep_dive_spark.plans import CATALOG  # noqa: E402
from citibike_deep_dive_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
# --replicas N / --dst DIR extend the derivation to other scale points
# (r13: the sf3/sf10 datapoints that settle the two local-mode
# floor-bound weak rows — same decorrelation scheme, more replicas)
DST = "/tmp/sparkgraft_sf1"
REPLICAS = 10
if "--replicas" in sys.argv:
    REPLICAS = int(sys.argv[sys.argv.index("--replicas") + 1])
if "--dst" in sys.argv:
    DST = sys.argv[sys.argv.index("--dst") + 1]

QUERIES = [
    "simhash_hamming_pairs",
    "simhash64_hamming_pairs",
    "semdedup_prune",
    "semdedup_prune_subcells",
    "training_corpus_prep",
    "dock_deep_merge_nested_maps",
    "dedup_lsh_candidate_pairs",
    "minhash_jaccard_estimate",
    # round-8 additions
    "dsir_importance_weights",
    "ccnet_perplexity_buckets",
    "chunk_dedup_reconstruct",
    "ann_ivfpq_rerank_exact",
    # round-8 session-2 additions (growth-sensitive shapes only: the
    # pair join, the score grid, the source-pair grid, the greedy loop)
    "sparse_cosine_neardup_pairs",
    "quantile_normalize_scores",
    "stylometry_burrows_delta",
    "mmr_diversified_topk",
    "link_prediction_adamic_adar",
    "kneser_ney_heldout_perplexity",
    # session-3 additions: the brute-force valuation (queries x corpus —
    # the quadratic shape), its IVF-shortlist production form, and the
    # in-cell consensus scan (quadratic within fixed cells at this SF;
    # cells ∝ corpus at true scale)
    "knn_shapley_values",
    "knn_shapley_ivf_shortlist",
    "knn_label_error_candidates",
    # session-3 token-grain / tournament shapes (cipher replicas make
    # per-source vocab grow 10x while the length support stays fixed)
    "naive_bayes_lang_classifier",
    "min_k_prob_membership",
    "rake_keyphrases",
    "textrank_keywords",
    "bradley_terry_strengths",
    "kmv_sketch_set_ops",
    # round-9 additions (VERDICT r8 item 6): the session-3 statistics
    # families with a nontrivial growth surface — support-grid two-sample
    # distances (grid^2 products bounded by distinct length values, but
    # the grids themselves grow with data variety), the duration-grid
    # log-rank, the subsequence-join matrix profile, the token-fan-out
    # PPMI, and the k-NN-graph LOF
    "wasserstein_source_lengths",
    "energy_distance_sources",
    "mmd_rbf_sources",
    "logrank_churn_arms",
    "matrix_profile_motifs",
    "ppmi_skipgram_pairs",
    "lof_embedding_outliers",
    # round-10 additions: per-doc encode+decode UDF chains (payload
    # bytes grow linearly with docs) and the token-explode -> bounded
    # piece-vocab unigram tokenizer (cipher replicas grow the distinct
    # word/piece sets ~10x while the DP stays per-row scalar work)
    "multimodal_png_pixel_stats",
    "multimodal_wav_audio_stats",
    "unigram_lm_viterbi_segments",
    "chrf_adjacent_doc_pairs",
    "multimodal_wav_spectral_features",
    "multimodal_image_phash_buckets",
    # round-11 addition: char-grain explode + 31-lag rolling-hash window
    # (rows scale linearly with corpus bytes; cipher replicas keep
    # within-replica chunk-duplicate structure and decorrelate the
    # cross-replica signature space)
    "cdc_gear_chunk_dedup",
    # round-11 batch 2: the char-grain gram explode + island windows
    # and the token-grain register sketch. graph_triangle_count is
    # EXCLUDED like the rest of the mutual-kNN family (rich_club,
    # assortativity): the replica derivation keeps the label-cell count
    # fixed, so the within-cell pair scan grows 100x at sf1 — an
    # artifact of the derivation, not the operator (cells ∝ corpus at
    # true scale; the knn_shapley entries carry the same note).
    "repeated_substring_spans",
    "hll_source_cardinality",
    # round-12 addition: per-doc fixed-point FFT (constant work per doc,
    # linear in docs — the O(n log n) scale form of the DFT demo)
    "multimodal_fft_spectral_power",
    "multimodal_stft_spectrogram",
]

ALPHA = string.ascii_lowercase
ALPHA_U = string.ascii_uppercase


def generate(spark) -> None:
    from pyspark.sql import functions as F

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for r in range(REPLICAS):
        # beyond 26 replicas the cipher ring repeats (rr = r % 26):
        # replicas 26 apart carry identical text under shifted ids —
        # a realistic cross-source exact-duplicate cluster structure
        # (real 100x corpora are FULL of cross-source dups), noted in
        # the sf10 BASELINE row
        rr = r % len(ALPHA)
        rot = ALPHA[rr:] + ALPHA[:rr]
        rot_u = ALPHA_U[rr:] + ALPHA_U[:rr]
        parts.append(
            docs.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.translate("text", ALPHA + ALPHA_U, rot + rot_u).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    parts = []
    for r in range(REPLICAS):
        re_ = r % 64
        rotated = F.concat(
            F.slice(F.col("embedding"), re_ + 1, 64 - re_),
            F.slice(F.col("embedding"), 1, re_),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + r * 100_000).alias("vec_id"),
                rotated.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    parts = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + r * 300_000_000)
        for r in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    # events: user_id shifted by 1M per replica — 10x users at the same
    # per-user event density and the same 30-day window, which is how a
    # real event stream scales (more users, not a longer history). The
    # shifted ids land in different hash-split arms, decorrelating the
    # replicas for the churn/AB queries; event_id shifted to stay unique.
    events = spark.read.parquet(f"{SRC}/events.parquet")
    parts = [
        events.withColumn("user_id", F.col("user_id") + r * 1_000_000)
        .withColumn("event_id", F.col("event_id") + r * 10_000_000)
        for r in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/events.parquet")


def main() -> None:
    spark = get_spark(
        app_name="citibike-bench-sf1",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "--regen" in sys.argv or not os.path.isdir(f"{DST}/documents.parquet"):
        generate(spark)

    con = duckdb.connect()
    for t in ("documents", "embeddings", "orders", "events"):
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{DST}/{t}.parquet/*.parquet'"
        )
    # unused by the benched queries, registered so oracles never 404
    for t in ("region", "nation", "customer", "supplier", "part", "lineitem"):
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'"
        )

    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    results: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        if only is not None and name not in only:
            continue
        spec = CATALOG[name]
        df = spec.build(spark, DST)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        d_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.sql(spec.oracle).fetchall()
            d_runs.append(time.perf_counter() - t0)
        results[name] = {
            "spark": round(min(runs), 3),
            # first-run time: the full rebuild for queries whose later
            # runs reuse lazily-checkpointed shared intermediates (the
            # DuckDB side re-executes fully every run, so min-vs-min
            # alone would flatter those Spark numbers — bench.py's
            # queries_cold rationale)
            "spark_cold": round(runs[0], 3),
            "duckdb": round(min(d_runs), 3),
            "ratio": round(min(runs) / min(d_runs), 2),
            "ratio_cold": round(runs[0] / min(d_runs), 2),
        }
        print(f"# {name}: {results[name]}", file=sys.stderr)

    with open("/proc/loadavg") as fh:
        load = [round(float(x), 2) for x in fh.read().split()[:3]]
    # Same one-line JSON contract as bench.py (VERDICT r13 item 8):
    # metric/value/unit/queries{name: sec}/sf on stdout so scale
    # evidence is first-class round over round; the per-query
    # Spark/DuckDB pairs ride along under queries_detail.
    total = round(sum(r["spark"] for r in results.values()), 3)
    print(json.dumps({
        "metric": "sf1_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": {k: v["spark"] for k, v in results.items()},
        "sf": REPLICAS / 10.0,
        "replicas": REPLICAS,
        "queries_detail": results,
        "duckdb_total": round(sum(r["duckdb"] for r in results.values()), 3),
        "duckdb_version": duckdb.__version__,
        "loadavg_after": load,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
