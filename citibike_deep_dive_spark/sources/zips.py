"""Zip-archive ingestion (S4/S5/S6).

Reference: citibike_data_process/data_processing/ingestion/zip_processing.py
:28-84 — open archive, skip ``__MACOSX``/dot members, read ``.csv``
members, recurse ONE level into nested ``.zip`` members; then Arrow CSV
parse + concat (:10-25).

Two Spark-first paths:

1. ``extract_to_staging`` (default): driver-side unzip to a staging dir,
   then ONE ``spark.read.csv(staging_glob)`` — the cluster parses CSVs in
   parallel with full pushdown. Right for the reference's actual scale
   (one archive at a time, each holding a handful of CSVs).

2. ``read_zips_distributed``: ``binaryFile`` source + ``mapInPandas``
   doing in-executor zipfile extraction — for the 100 TB case where
   thousands of archives must be exploded cluster-side without a staging
   hop. Each archive lands in one task; Spark's partition packing
   (maxPartitionBytes) spreads archives across executors.
"""

from __future__ import annotations

import io
import os
import zipfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _wanted(name: str) -> bool:
    base = os.path.basename(name)
    return (
        not name.startswith("__MACOSX")
        and not base.startswith(".")
        and base.lower().endswith(".csv")
    )


def iter_csv_members(data: bytes, _depth: int = 0) -> Iterator[tuple[str, bytes]]:
    """Yield (member_name, csv_bytes) from an archive, recursing one level
    into nested zips (zip_processing.py:48-84)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            name = info.filename
            if name.startswith("__MACOSX") or os.path.basename(name).startswith("."):
                continue
            if _wanted(name):
                yield name, zf.read(info)
            elif name.lower().endswith(".zip") and _depth == 0:
                yield from iter_csv_members(zf.read(info), _depth=1)


def extract_to_staging(zip_path: str, staging_dir: str) -> list[str]:
    """S4 path 1: driver-side extraction of one archive into a staging
    directory; returns written CSV paths for ``spark.read.csv``."""
    os.makedirs(staging_dir, exist_ok=True)
    out = []
    with open(zip_path, "rb") as fh:
        data = fh.read()
    for name, payload in iter_csv_members(data):
        dest = os.path.join(staging_dir, os.path.basename(name))
        with open(dest, "wb") as fh:
            fh.write(payload)
        out.append(dest)
    return out


def read_staged_csvs(spark: SparkSession, paths: list[str]) -> DataFrame:
    """S5/S6: one multi-path CSV read — header inference per the
    reference's Arrow read_csv; schema conformance happens downstream in
    normalize_trips (timestamps parsed there via try_to_timestamp)."""
    return spark.read.csv(paths, header=True, inferSchema=False)


CSV_LINES_SCHEMA = T.StructType(
    [
        T.StructField("archive", T.StringType()),
        T.StructField("member", T.StringType()),
        T.StructField("csv", T.BinaryType()),
    ]
)


def read_zips_distributed(spark: SparkSession, glob: str) -> DataFrame:
    """S4 path 2: distributed extraction. Returns one row per CSV member
    (archive, member, csv bytes); callers parse members with pandas
    inside a second mapInPandas or write them to a staging location.

    binaryFile keeps archive bytes off the driver entirely.
    """
    binary = spark.read.format("binaryFile").load(glob)

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                for name, payload in iter_csv_members(row.content):
                    rows.append((row.path, name, payload))
            yield pd.DataFrame(rows, columns=["archive", "member", "csv"])

    return binary.select("path", "content").mapInPandas(explode, CSV_LINES_SCHEMA)


def parse_csv_members_distributed(
    members: DataFrame, columns: list[str]
) -> DataFrame:
    """Complete S4 path 2: parse each extracted CSV member's bytes into
    rows, all executor-side (pandas read_csv per member inside the Arrow
    batch — never touches the driver or a staging filesystem).

    ``columns`` fixes the output schema (all strings — the canonical
    typed cast happens downstream in normalize_trips, exactly like the
    staged path). Members missing a column yield nulls; extra columns are
    dropped — the P2 pad / P3 project semantics at the parse edge.
    """
    out_schema = T.StructType([T.StructField(c, T.StringType()) for c in columns])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                df = pd.read_csv(io.BytesIO(row.csv), dtype=str)
                df.columns = [str(c) for c in df.columns]
                for c in columns:
                    if c not in df.columns:
                        df[c] = None
                frames.append(df[columns])
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return members.mapInPandas(parse, out_schema)
