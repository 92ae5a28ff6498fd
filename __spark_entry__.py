"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalog itself lives in ``citibike_deep_dive_spark.plans`` — one
QuerySpec per implemented operator from SURVEY.md §2 plus the
training-data extensions (dedup / similarity / text / multimodal /
streaming-analog).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citibike_deep_dive_spark.plans import CATALOG  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the LineGraph-shape conditional-count
    aggregation (SURVEY.md §7 step 3 — the reference's first derived
    table, A1 + F1 + P5)."""
    return CATALOG["linegraph_conditional_counts"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: spec.build for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; rows-only ops are omitted."""
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle}
