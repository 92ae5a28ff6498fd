"""Unified multi-format table IO: parquet, ORC, JSON-lines, CSV.

The reference ingests CSV-in-zip only (citibike_data_process/
data_processing/ingestion/ingestion.py); this module widens the source/
sink surface to every format Spark reads natively, behind one
extension-inferring entry point, so a pipeline stage never hard-codes
its storage format.

Format notes (and why they matter at 100 TB):
- parquet/ORC are the only columnar options: predicate pushdown, column
  pruning, and per-rowgroup min/max skipping all require them. CSV and
  JSON scans always read every byte — keep them for ingest edges and
  interchange, never for intermediate tables.
- CSV/JSON readers take an explicit schema: schema inference is a full
  extra pass over the data (unbounded at scale) and type-guesses
  drift (ints→doubles on a single null). An explicit schema is one
  metadata broadcast.
- Writers thread ``partition_by`` through so sinks lay out
  hive-partitioned directories (the (year,month) pruning index from
  SURVEY.md §2 S11 works for any format).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Spark's default text-format timestamp pattern keeps only milliseconds;
# parquet/ORC store micros. Pin a microsecond pattern on BOTH sides so a
# CSV/JSON round-trip is lossless like the columnar formats.
_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

_EXT_TO_FORMAT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".csv": "csv",
}

SUPPORTED_FORMATS = ("parquet", "orc", "json", "csv")


def infer_format(path: str) -> str:
    """Infer a storage format from the path extension (directories of
    part-files keep their logical extension, e.g. ``events.orc/``)."""
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    fmt = _EXT_TO_FORMAT.get(ext)
    if fmt is None:
        raise ValueError(
            f"cannot infer format from {path!r}; pass fmt= explicitly "
            f"(supported: {SUPPORTED_FORMATS})"
        )
    return fmt


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read a table in any supported format.

    parquet/ORC carry their own schema; CSV and JSON require one (or
    pay an inference pass — allowed here only when ``schema`` is None
    AND the caller accepts the cost, which we surface by requiring
    explicit opt-in via schema=None on a text format).
    """
    fmt = fmt or infer_format(path)
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (supported: {SUPPORTED_FORMATS})")
    reader = spark.read
    if fmt in ("csv", "json"):
        # NTZ columns (e.g. events.ts) are parsed via the separate
        # timestampNTZFormat option; without it Spark falls back to a
        # millis-precision default and sub-ms digits are lost.
        reader = reader.option("timestampFormat", _TS_FORMAT).option(
            "timestampNTZFormat", _TS_FORMAT
        )
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(path)
    if fmt == "json":
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path)
    return reader.format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write a table in any supported format, optionally hive-partitioned.

    Timestamps round-trip natively in parquet/ORC; for CSV/JSON they
    serialize as ISO strings (Spark's default writer format) and need
    the matching schema on read — which read_table supplies.
    """
    fmt = fmt or infer_format(path)
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (supported: {SUPPORTED_FORMATS})")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt in ("csv", "json"):
        writer = writer.option("timestampFormat", _TS_FORMAT).option(
            "timestampNTZFormat", _TS_FORMAT
        )
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)
