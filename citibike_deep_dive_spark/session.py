"""SparkSession factory.

Mirrors the reference's engine bootstrap (``db_setup.py`` — PRAGMA threads /
memory_limit / enable_optimizer; reference:
citibike_data_process/data_processing/setup/db_setup.py:12-21) as Spark
session configuration.

Scale notes (100 TB target):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace the reference's hand-rolled
  per-year chunking (citibike_data_process/table_updating/update_dockmap.py:45-51).
- Timezone pinned UTC (ANSI stays at the Spark 4 default ON — strict on
  query paths; the ingest edge uses try_cast/try_to_timestamp so dirty
  rows quarantine instead of aborting) so timestamp semantics match the
  reference's naive ``pa.timestamp("ns")`` columns
  (citibike_data_process/data_processing/setup/clean_up.py:21-22) and the
  DuckDB oracle.
- ``spark.sql.session.timeZone=UTC`` + Arrow execution for the few
  pandas-UDF edges.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "citibike-deep-dive-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    In production this is a cluster session; locally it defaults to
    ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime partition coalescing + skew handling (replaces the
        # reference's manual per-year chunking and its (year,month) index).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Deterministic timestamp semantics vs the DuckDB oracle. The
        # events TIMESTAMP_NANOS column needs no conf: Spark 4.1+ reads it
        # natively as TIMESTAMP_NTZ (naive wall clock, same as DuckDB),
        # and plans use functions/timeutil.ts_micros for epoch arithmetic
        # so they are immune to both the reader flavor and this timezone.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for the pandas-UDF edges (route enrichment, multimodal).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
