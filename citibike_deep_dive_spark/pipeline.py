"""The end-to-end incremental pipeline — the reference's main loop
(citibike_data_process/main.py:23-83) as one idempotent function.

Per new archive (state-gated, chronological):
  discover → extract → read CSVs → normalize_trips → update the derived
  tables (linegraph, heatmap, dock, trips) → advance the state table —
then optionally export the warehouse as a DuckDB file (the reference's
terminal artifact) and upload it to S3.

Differences from the reference, by design (SURVEY.md §7):
- tables are Parquet dirs updated by atomic rewrite, not in-place UPDATEs;
- the per-file × per-table loop keeps the reference's ordering so the
  StatusData gate stays correct across partial runs;
- route enrichment uses the injectable geometry provider (offline
  deterministic by default — no network in the data path).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .normalize import normalize_trips
from .operators.dockmap import dock_aggregate, dock_merge
from .operators.heatmap import heatmap_update
from .operators.linegraph import linegraph_update
from .operators.tripsmap import (
    GeometryProvider,
    enrich_routes,
    top_trips,
    trip_aggregate,
    tripsmap_update,
)
from .sources.discovery import CandidateFile, discover_local
from .sources.state import advance_state, load_state, new_files, save_state
from .sources.zips import extract_to_staging, read_staged_csvs

DERIVED_TABLES = ("linegraph", "heatmap", "dock", "trips")


@dataclass
class PipelineResult:
    processed: list[CandidateFile]
    skipped: int


def _table_path(warehouse_dir: str, name: str) -> str:
    return os.path.join(warehouse_dir, name)


def read_table(spark: SparkSession, warehouse_dir: str, name: str) -> DataFrame | None:
    path = _table_path(warehouse_dir, name)
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def write_table(df: DataFrame, warehouse_dir: str, name: str) -> None:
    """Atomic-ish rewrite: write to a temp dir, swap into place (the
    plain-Parquet stand-in for DuckDB's transactional UPDATE)."""
    final = _table_path(warehouse_dir, name)
    tmp = final + "__tmp"
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)


def process_archive(
    spark: SparkSession,
    cand: CandidateFile,
    staging_dir: str,
    warehouse_dir: str,
    top_k: int = 30,
    geometry_provider: GeometryProvider | None = None,
) -> None:
    """Ingest one archive and merge it into all derived tables (the body
    of the reference's per-file loop, main.py:62-76)."""
    paths = extract_to_staging(cand.name, staging_dir)
    raw = read_staged_csvs(spark, paths)
    trips = normalize_trips(raw, file_year=str(cand.year)).cache()
    try:
        write_table(
            linegraph_update(read_table(spark, warehouse_dir, "linegraph"), trips),
            warehouse_dir,
            "linegraph",
        )
        write_table(
            heatmap_update(read_table(spark, warehouse_dir, "heatmap"), trips),
            warehouse_dir,
            "heatmap",
        )
        write_table(
            dock_merge(read_table(spark, warehouse_dir, "dock"), dock_aggregate(trips)),
            warehouse_dir,
            "dock",
        )
        enriched = enrich_routes(
            top_trips(trip_aggregate(trips), k=top_k), geometry_provider
        )
        write_table(
            tripsmap_update(read_table(spark, warehouse_dir, "trips"), enriched),
            warehouse_dir,
            "trips",
        )
    finally:
        trips.unpersist()


def run_pipeline(
    spark: SparkSession,
    input_dir: str,
    warehouse_dir: str,
    state_path: str | None = None,
    staging_dir: str | None = None,
    top_k: int = 30,
    geometry_provider: GeometryProvider | None = None,
) -> PipelineResult:
    """Discover archives in ``input_dir``, ingest only the state-gated new
    ones, maintain the derived tables under ``warehouse_dir``. Idempotent:
    a second run over the same inputs processes nothing."""
    os.makedirs(warehouse_dir, exist_ok=True)
    state_path = state_path or os.path.join(warehouse_dir, "_state")
    staging_dir = staging_dir or os.path.join(warehouse_dir, "_staging")
    os.makedirs(staging_dir, exist_ok=True)

    state = load_state(spark, state_path)
    candidates = discover_local(input_dir)
    todo = new_files(candidates, state)
    for cand in todo:
        process_archive(
            spark,
            cand,
            staging_dir,
            warehouse_dir,
            top_k=top_k,
            geometry_provider=geometry_provider,
        )
        # advance + persist state after EVERY file (main.py:64-76 ordering)
        # so a crash mid-run never reprocesses completed archives
        state = advance_state(state, cand)
        save_state(spark, state, state_path)
    return PipelineResult(processed=todo, skipped=len(candidates) - len(todo))
