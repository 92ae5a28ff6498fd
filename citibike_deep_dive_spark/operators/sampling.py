"""Deterministic sampling & splitting for training-data curation.

Random sampling (``df.sample``/``sampleBy``) is partition-layout-dependent
— a repartition or speculative retry changes the sample. At 100 TB the
reproducible alternative is HASH-based sampling: a row is in the sample
iff a stable hash of its key lands under the rate cutoff. Properties:

- deterministic across reruns, engines, partitionings (md5 is portable);
- consistent: a row's assignment never changes as the corpus grows;
- composable: the same key hashing yields disjoint train/val/test splits.

This is how production data pipelines pin their eval splits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 hex chars = 32 bits — plenty of resolution for percent-scale rates
_BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = _BUCKETS) -> Column:
    """Stable bucket in [0, buckets) from md5 of the key's string form."""
    from ..functions import portable_hash64

    return portable_hash64(key.cast("string"), width=8) % buckets


def deterministic_sample(df: DataFrame, key: str, rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by key hash (reproducible sample)."""
    return df.filter(hash_bucket(F.col(key)) < int(rate * _BUCKETS))


def train_val_test_split(
    df: DataFrame, key: str, val: float = 0.1, test: float = 0.1
) -> DataFrame:
    """Add a ``split`` column: disjoint train/val/test by key hash.

    Buckets [0, val) → val, [val, val+test) → test, rest → train — the
    assignment is a pure function of the key, so it survives reprocessing
    and incremental appends (new rows join their split, old rows never
    move — no eval-set contamination).
    """
    b = hash_bucket(F.col(key))
    val_hi = int(val * _BUCKETS)
    test_hi = val_hi + int(test * _BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < val_hi, "val").when(b < test_hi, "test").otherwise("train"),
    )


def weighted_source_mix(
    df: DataFrame, source_col: str, key: str, weights: dict[str, float]
) -> DataFrame:
    """Down/up-weight corpus sources by per-source sampling rates
    (dataset mixing: keep weights[source] of each source's rows, by key
    hash). Sources absent from ``weights`` are dropped — an explicit
    mixture spec, as in training-data recipes."""
    expr = F.lit(None).cast("long")
    for src, w in weights.items():
        expr = F.when(F.col(source_col) == src, F.lit(int(w * _BUCKETS))).otherwise(expr)
    return df.filter(hash_bucket(F.col(key)) < expr)


def weighted_sample_wor(
    df: DataFrame, key: str, weight: Column, k: int = 50
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis): each row ranks by ln(u)/w for a hash-seeded
    uniform u — the top-k by that key is an exact weighted sample, no
    sequential draw. The curation workhorse for "sample 10M docs
    proportional to quality score".

    Distributed shape: the rank key is per-row (no shuffle); selection
    is TakeOrdered top-k (per-partition heap). Replays identically on
    any cluster AND on the DuckDB oracle (portable hash-derived u).
    """
    from ..functions import portable_unit_uniform

    u = portable_unit_uniform(F.col(key).cast("string"))
    rank_key = F.log(u) / weight
    return (
        df.select(
            F.col(key),
            weight.cast("double").alias("weight"),
            F.round(rank_key, 10).alias("rank_key"),
        )
        .orderBy(F.col("rank_key").desc(), F.col(key))
        .limit(k)
    )


def corpus_shuffle_shards(
    df: DataFrame, key: str, shards: int = 16
) -> DataFrame:
    """Deterministic global shuffle + sharding: the step between curation
    and training that breaks source/time locality (a corpus written in
    crawl order trains badly) and fixes each example's shard and position
    so every re-run, resume, and distributed reader sees the SAME order.

    Hash-derived sort key → shard = h mod ``shards``, pos = rank within
    shard. Pure function of the key: append-safe and replayable.

    Scale: one shuffle keyed by shard (uniform by construction — the
    hash is uniform), then a partition-local sort per shard; no global
    sort. ``shards`` should be O(reader parallelism), keeping each
    in-shard sort bounded.
    """
    from pyspark.sql import Window

    from ..functions import portable_hash64

    h = portable_hash64(F.concat(F.lit("shuffle:"), F.col(key).cast("string")))
    keyed = df.select(F.col(key), h.alias("__h"))
    shard = (F.col("__h") % shards).cast("int")
    w = Window.partitionBy("shard").orderBy("__h", key)
    return (
        keyed.withColumn("shard", shard)
        .select(
            F.col(key),
            "shard",
            F.row_number().over(w).alias("pos"),
        )
    )
