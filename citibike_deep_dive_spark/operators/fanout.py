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


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: defaultParallelism)
    iff it scans fewer input files than that. No-op on well-split
    inputs, so it is safe to leave in place for cluster runs."""
    spark = df.sparkSession
    goal = target or spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < goal:
        return df.repartition(goal)
    return df
