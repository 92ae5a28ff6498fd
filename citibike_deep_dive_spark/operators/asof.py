"""As-of (point-in-time) join — an operator Spark has no native form for.

For each left row, attach the single right row with the greatest
``right.ts <= left.ts`` within the same key group (the standard
time-series enrichment: latest price/profile/config as of event time).

Spark re-expression (the scalable one): UNION the two sides tagged by
origin, then one window pass per key ordered by (ts, origin) carrying the
last non-null right payload forward. Compared to the naive
range-join-then-rank (a near-quadratic join at scale), this is ONE
shuffle on the key and a linear scan per partition — the same plan shape
a native as-of physical operator would produce.

Right side must be unique per (key, ts) — pre-aggregate if not — so the
match is deterministic (DuckDB ASOF JOIN, the oracle, has the same
requirement for determinism).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` values
    with ``right[on] <= left[on]``, matched within ``by`` keys. Right
    columns come back null when no prior right row exists.

    ``value_cols`` defaults to all right columns except ``by`` + ``on``.
    """
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != on]
    payload = F.struct(*[F.col(c) for c in value_cols])

    left_cols = [c for c in left.columns]
    # origin 0 = right, 1 = left: at equal ts the right row sorts first,
    # so an exactly-simultaneous right value IS visible to the left row
    # (matches ASOF's <= semantics).
    r = right.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__origin"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in by],
    )
    l = left.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__origin"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in left_cols if c not in by],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__origin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out_cols = [F.col(c) for c in left_cols]
    out_cols += [F.col(f"__match.{c}").alias(c) for c in value_cols]
    return filled.filter(F.col("__origin") == 1).select(*out_cols)
