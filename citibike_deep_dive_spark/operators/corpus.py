"""Corpus-level training-data operators: benchmark decontamination,
incremental (new-batch vs existing-corpus) dedup, temperature-based
source mixing, and vocabulary coverage.

These extend the dedup/similarity family (BASELINE.json north star) with
the cross-set operations a production LM-data pipeline runs on every
ingest: "does this new shard overlap my eval benchmarks?", "which new
docs are already in the corpus?", "how do I weight sources for the next
training mix?".

Scale notes (100 TB corpus):
- decontamination broadcasts the BENCHMARK shingle set (eval suites are
  tiny by construction — MBs, not TBs), so the corpus-side scan never
  shuffles its text: a map-side hash semi-join per gram.
- incremental dedup joins on digest / (band, band_hash) — uniform keys,
  bounded buckets; the new-batch side is the small side of every join.
- temperature mixing aggregates to one row per source (dozens), then
  broadcasts the scalar total — no global sort, no driver collect.
- vocabulary coverage's only ordered step is a distributed top-k
  (``orderBy().limit(k)`` = TakeOrdered on executors) and a window over
  the k surviving rows — state bounded by k, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import lsh_bands, minhash_signatures, shingle_frame
from .fanout import fan_out


def benchmark_decontaminate(
    docs: DataFrame, bench_mod: int = 29, width_tag: str = "3-gram"
) -> DataFrame:
    """Flag training docs sharing any word shingle with the benchmark set.

    The benchmark membership rule (``doc_id % bench_mod == 0``) stands in
    for a real eval-suite table; the plan shape is the point: shingle both
    sides with the SAME shingler as near-dup (dedup.shingles), broadcast
    the benchmark grams, count distinct contaminated grams per train doc.
    """
    is_bench = F.col("doc_id") % bench_mod == 0
    bench_grams = (
        shingle_frame(docs.filter(is_bench))
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    train_grams = shingle_frame(docs.filter(~is_bench)).select(
        "doc_id", F.explode("sh").alias("g")
    )
    return (
        train_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("contaminated_grams"))
    )


def _is_new(new_mod: int, new_rem: int) -> Column:
    return F.col("doc_id") % new_mod == new_rem


def incremental_exact_survivors(
    docs: DataFrame, new_mod: int = 10, new_rem: int = 7
) -> DataFrame:
    """New-batch docs whose exact text digest is NOT already in the corpus.

    The per-ingest form of exact dedup: digest both sides, distinct the
    corpus digests (map-side combined), anti-join the new batch. At scale
    the anti-join shuffles by digest — uniform and skew-free.
    """
    is_new = _is_new(new_mod, new_rem)
    corpus_digests = (
        fan_out(docs.filter(~is_new)).select(F.md5("text").alias("digest")).distinct()
    )
    return (
        fan_out(docs.filter(is_new))
        .select("doc_id", F.md5("text").alias("digest"))
        .join(corpus_digests, "digest", "left_anti")
        .select("doc_id", "digest")
    )


def incremental_neardup_survivors(
    docs: DataFrame,
    new_mod: int = 10,
    new_rem: int = 7,
    k: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """New-batch docs that share NO LSH band bucket with the corpus.

    Same minhash family + banding as lsh_candidate_pairs, but cross-set:
    corpus bands collapse to distinct (band, band_hash) buckets, the new
    batch semi-joins against them, survivors are the anti-join remainder.
    Per-band bucket keys are bounded-width hashes — the join never sees
    raw text, so the corpus side shuffles O(corpus × n_bands) small rows.
    """
    is_new = _is_new(new_mod, new_rem)

    def bands(side: DataFrame) -> DataFrame:
        return lsh_bands(minhash_signatures(fan_out(side), k=k), rows_per_band)

    corpus_buckets = bands(docs.filter(~is_new)).select("band", "band_hash").distinct()
    new_bands = bands(docs.filter(is_new))
    hits = (
        new_bands.join(corpus_buckets, ["band", "band_hash"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        docs.filter(is_new).select("doc_id").join(hits, "doc_id", "left_anti")
    )


def temperature_mix(
    docs: DataFrame, alpha: float = 0.7, token_budget: int = 1_000_000
) -> DataFrame:
    """Temperature-based source weights: w_s ∝ n_s^alpha, normalized, plus
    each source's share of a global token budget (the multilingual-LM
    rebalancing recipe — alpha < 1 upsamples small sources).

    One aggregation to source grain, then a broadcast of the 1-row total;
    no collect, no global sort.
    """
    per_src = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("w_raw", F.pow("n_docs", F.lit(alpha)))
    )
    total = per_src.agg(F.sum("w_raw").alias("w_tot"))
    return per_src.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        F.round(F.col("w_raw") / F.col("w_tot"), 6).alias("weight"),
        F.round(F.lit(float(token_budget)) * F.col("w_raw") / F.col("w_tot"))
        .cast("long")
        .alias("token_budget"),
    )


def vocab_coverage(docs: DataFrame, top_k: int = 100) -> DataFrame:
    """Top-k vocabulary with cumulative corpus coverage.

    Token counts shuffle once (by token, map-side combined); the top-k is
    ``orderBy().limit(k)`` — Spark plans TakeOrdered, a per-partition
    heap + driver merge, NOT a global sort. The cumulative-coverage
    window then runs over exactly k rows.
    """
    toks = fan_out(docs).select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    top = counts.orderBy(F.col("cnt").desc(), "token").limit(top_k)
    order = [F.col("cnt").desc(), F.col("token")]
    cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return top.crossJoin(F.broadcast(total)).select(
        "token",
        "cnt",
        F.row_number().over(Window.orderBy(*order)).alias("rank"),
        F.round(
            F.sum("cnt").over(cum) / F.col("total").cast("double"), 6
        ).alias("coverage"),
    )
