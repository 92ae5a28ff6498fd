"""Engine-portable deterministic hashing, as column expressions.

One hash family underpins every bucketed join, salting key, band hash,
deterministic sample, and sketch in this repo: the leading hex digits of
md5, reinterpreted as a BIGINT. It is the ONLY hash this codebase found
that both Spark and DuckDB compute identically (xxhash64/F.hash are
Spark-private; DuckDB's hash() is DuckDB-private), which makes it the
basis of every oracle-checked randomized operator. Centralized here so
call sites and their DuckDB oracle SQL cannot drift apart.

Cost note: md5 per value is ~100 ns-scale JVM work inside whole-stage
codegen — fine on data paths; derive FAMILIES of hashes from one digest
(Carter–Wegman a+b·i style, see operators/dedup.py) rather than hashing
per family member.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: the widest slice that stays inside a signed
# BIGINT on both engines (16 would need unsigned).
_WIDTH = 15
_UNIT_DENOM = float(1 << 60)


def portable_hash64(col: Column, start: int = 1, width: int = _WIDTH) -> Column:
    """Non-negative BIGINT hash of a string column, identical on Spark
    and DuckDB. ``start`` selects a hex window of the digest, so two
    windows (e.g. 1 and 17) give independent hashes from one md5."""
    return F.conv(F.substring(F.md5(col), start, width), 16, 10).cast("long")


def portable_hash64_sql(expr: str, start: int = 1, width: int = _WIDTH) -> str:
    """The DuckDB-side twin of :func:`portable_hash64` for oracle SQL."""
    return f"('0x' || substr(md5({expr}), {start}, {width}))::BIGINT"


def portable_unit_uniform(col: Column) -> Column:
    """Deterministic uniform in (0, 1): the 60-bit hash scaled down, with
    the zero point nudged so downstream log()s never see 0. Basis for
    hash-seeded randomized ops (weighted sampling, jitter) that must
    replay identically on both engines and across retries."""
    return (portable_hash64(col) + F.lit(0.5)) / F.lit(_UNIT_DENOM)


def portable_unit_uniform_sql(expr: str) -> str:
    """DuckDB twin of :func:`portable_unit_uniform`."""
    return (
        f"(({portable_hash64_sql(expr)})::DOUBLE + 0.5) / {_UNIT_DENOM!r}"
    )
