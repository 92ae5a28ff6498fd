"""Skew-mitigation primitives: salted two-phase aggregation.

At 100 TB a handful of hot keys (one mega-station, one boilerplate
document, one dominant event type) can pin an aggregation on a single
reducer. The classic fix is salting: split each hot key into N synthetic
sub-keys, partially aggregate at (key, salt) grain — map-side combine
keeps this cheap — then re-aggregate the N partials per key. AQE's skew
handling covers JOINS; for aggregations whose single-key cardinality
still overwhelms one task, explicit salting is the tool.

Result-identical to the plain aggregation for any decomposable aggregate
(count/sum/min/max), which is exactly the family the reference uses
(SURVEY.md §2.4); verified against the plain-GROUP-BY DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial aggregate, final re-aggregate) per decomposable function
_DECOMPOSABLE = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    salt_buckets: int = 32,
    salt_col: Column | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` is a list of (function, input_column, output_alias) with
    function in {count, sum, min, max}. ``salt_col`` defaults to a
    deterministic hash of the whole row (xxhash64) so re-runs and
    speculative retries agree.
    """
    salt = (
        salt_col
        if salt_col is not None
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial_exprs = []
    final_exprs = []
    for fn, col, alias in aggs:
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{fn} is not decomposable; salting would change results")
        partial, final = _DECOMPOSABLE[fn]
        partial_exprs.append(partial(col).alias(f"__p_{alias}"))
        final_exprs.append(final(f"__p_{alias}").alias(alias))
    partials = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    return partials.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_buckets: int = 8,
    salt_col: Column | None = None,
) -> DataFrame:
    """Skew-proof inner equi-join: salt the big side, replicate the small
    side once per salt bucket, join on (key, salt).

    A hot key that would land its entire partition on one reducer is
    split across ``salt_buckets`` tasks; the small side grows by the same
    factor (fine — it's the small side). Result-identical to the plain
    join: every big row still meets every matching small row exactly
    once, under exactly one salt value. Prefer AQE skew-join splitting
    when it fires; explicit salting is for the cases it can't see
    (e.g. skew introduced by an upstream transform, or non-shuffle-file
    stats). Salt defaults to a deterministic hash of the big row so
    speculative retries agree.
    """
    salt = (
        salt_col
        if salt_col is not None
        else F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    salted_big = big.withColumn("__salt", salt)
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    joined = salted_big.join(
        replicated_small,
        (F.col(big_key) == F.col(small_key)) & (salted_big["__salt"] == replicated_small["__salt"]),
    )
    return joined.drop("__salt")
