"""Scan-side parallelism repair for under-partitioned inputs.

A parquet scan parallelizes at file/row-group granularity. When an
input is a handful of small files with one row group each (tiny dims, a
single gzip'd upload, the local test fixtures), every downstream
*narrow* transform — regex scrubbing, per-shingle hashing, timestamp
parsing — inherits that single task and runs on one core while the rest
of the cluster idles. Aggregating queries recover at their first
exchange; pure map pipelines never do.

``fan_out`` repartitions only when the plan reads fewer files than the
session's default parallelism (checked via ``inputFiles()`` — pure
driver-side metadata, no job). At the 100 TB design point inputs arrive
as thousands of files/row groups, the condition is false, and this is a
no-op — no exchange is added. It pays one round-robin shuffle of the
(small, by construction) input only when the alternative is a
single-core pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pushdown_barrier(df: DataFrame) -> DataFrame:
    """Value-identical projection Catalyst cannot push a filter through.

    Each column is wrapped in ``element_at(shuffle(array(c)), 1)`` — a
    1-element array round-trip that always yields ``c`` but is flagged
    non-deterministic, so PushDownPredicates stops at this Project while
    ColumnPruning still drops the entries nobody reads (scans stay
    pruned). Deliberately NOT ``when(rand() < 2, c)``: SimplifyConditionals
    folds equal-branch CASEs away and the barrier vanishes.
    """
    return df.select(
        *[F.element_at(F.shuffle(F.array(F.col(c))), 1).alias(c) for c in df.columns]
    )


def fan_out(
    df: DataFrame, target: int | None = None, barrier: bool = False
) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: defaultParallelism)
    iff it scans fewer input files than that. No-op on well-split
    inputs, so it is safe to leave in place for cluster runs.

    ``barrier=True`` additionally wraps the fired repartition in
    ``pushdown_barrier``. Use it when an EXPENSIVE filter sits above the
    fan-out — the whole point of fanning out is to move per-row compute
    off the under-split scan, but Catalyst otherwise pushes every
    deterministic filter back through the round-robin exchange onto the
    single scan task; for a filter over derived timestamps/strings the
    substituted predicate re-runs the entire narrow pipeline single-core
    (observed: a 32-core normalize plan collapsing to one 1.3 s task).
    It stays opt-in because the barrier Project cannot collapse with its
    neighbors — one extra row copy that measurably taxes hot per-row
    loops (minhash/simhash) where scan-side pushdown was harmless.
    On well-split inputs: no exchange, no barrier, normal pushdown.
    """
    spark = df.sparkSession
    goal = target or spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < goal:
        out = df.repartition(goal)
        return pushdown_barrier(out) if barrier else out
    return df
