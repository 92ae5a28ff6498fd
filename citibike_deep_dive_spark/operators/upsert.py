"""Merge primitives: the reference's in-place UPDATE+INSERT pairs as
single declarative join-merges.

The reference maintains derived tables with a two-statement idiom:
``UPDATE main SET cnt = main.cnt + temp.cnt FROM temp WHERE keys match``
followed by ``INSERT ... LEFT JOIN ... WHERE main.key IS NULL``
(reference: citibike_data_process/table_updating/update_heatmap.py:17-35,
update_tripsmap.py:37-55 — SURVEY.md J2/J4/I3). Spark has no in-place
update; the idiomatic rewrite is ONE full-outer join producing the new
table contents, then an atomic overwrite.

Scale notes:
- The delta side (one month of aggregates) is small → broadcast it; the
  merge then never shuffles the main table.
- With a lakehouse format (Delta/Iceberg) this same function's plan maps
  to MERGE INTO; on plain Parquet the caller rewrites the table
  (write temp dir + swap) — see ``overwrite_table``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def additive_upsert(
    main: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    counters: Sequence[str],
    broadcast_delta: bool = True,
    delta_wins: bool = False,
) -> DataFrame:
    """UPDATE-add + INSERT-missing as one full-outer merge (J4+J2 / I3).

    Rows matching on ``keys`` get ``main.counter + delta.counter``; rows
    only in one side pass through (coalesce with 0). Non-key non-counter
    columns resolve main-first by default — the reference's UPDATE touches
    only the counter, so an already-present row KEEPS its other columns
    (e.g. waypoints, update_tripsmap.py:38-44) and only unseen rows take
    the delta's values via the INSERT. Pass ``delta_wins=True`` for
    newest-data-wins merges.
    """
    d = F.broadcast(delta) if broadcast_delta else delta
    joined = main.alias("m").join(d.alias("d"), list(keys), "full_outer")
    others = [c for c in main.columns if c not in keys and c not in counters]
    first, second = ("d", "m") if delta_wins else ("m", "d")
    cols = [F.col(k) for k in keys]
    cols += [
        (
            F.coalesce(F.col(f"m.{c}"), F.lit(0)) + F.coalesce(F.col(f"d.{c}"), F.lit(0))
        ).alias(c)
        for c in counters
    ]
    cols += [
        F.coalesce(F.col(f"{first}.{c}"), F.col(f"{second}.{c}")).alias(c)
        for c in others
    ]
    return joined.select(*cols)


def anti_insert(
    main: DataFrame, candidates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Rows of ``candidates`` whose keys are absent from ``main`` (J2/J3).

    The reference spells this both as LEFT JOIN … WHERE right IS NULL
    (update_heatmap.py:26-35) and as NOT IN (update_dockmap.py:253-258);
    with null keys pre-filtered the two coincide with a left-anti join.
    """
    return candidates.join(F.broadcast(main.select(*keys)), list(keys), "left_anti")


def overwrite_table(df: DataFrame, path: str, partition_by: Sequence[str] = ()) -> None:
    """Atomic-ish table rewrite: the plain-Parquet stand-in for DuckDB's
    in-place UPDATE (SURVEY.md §7 hard parts). Spark's overwrite mode
    stages to a temporary location then commits via rename."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
