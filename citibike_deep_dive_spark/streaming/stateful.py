"""Custom stateful streaming operators (applyInPandasWithState) and the
streaming additive-upsert sink.

Two pieces the built-in operators don't cover:

- ``streaming_first_seen``: exact dedup across an unbounded stream —
  first occurrence of each digest wins, later duplicates are dropped.
  State is the set of seen digests, sharded across 256 hex-prefix buckets
  so the per-group state stays bounded and the shuffle key is uniform.
  This is the streaming form of the batch exact-dedup operator
  (operators/dedup.exact_dedup) and of the reference's seen-files gate
  (citibike_data_process/data_processing/ingestion/new_file_check.py:4-45
  — "have I processed this before?" as engine state).

- ``additive_upsert_sink``: foreachBatch sink merging each micro-batch
  into a parquet table with the I3 additive-merge semantics
  (citibike_data_process/table_updating/update_heatmap.py:17-35), written
  atomically (temp dir + swap). With checkpointing this gives the
  exactly-once counter table the reference approximates with its
  StatusData gate.

Scale notes: first-seen state shards by digest prefix → 256 uniform
groups; at 100 TB-stream scale raise the prefix width (65k/1M groups) so
each group's seen-set fits the state store, and enable RocksDB state
backend. The upsert sink rewrites the table per batch — at scale, point
it at a partitioned table and merge only touched partitions, or swap the
sink for a lakehouse MERGE INTO.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.upsert import additive_upsert

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])


def streaming_first_seen(
    df: DataFrame, digest_col: str = "digest", prefix_width: int = 2
) -> DataFrame:
    """Keep only the first-seen row per ``digest_col`` across the stream.

    Rows inside one micro-batch dedup by pandas ``duplicated``; rows
    across batches dedup against the GroupState seen-set. Output schema ==
    input schema.
    """
    bucketed = df.withColumn("__bucket", F.substring(F.col(digest_col), 1, prefix_width))
    out_schema = df.schema
    out_cols = [f.name for f in df.schema.fields]

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh = pdf[~pdf[digest_col].isin(seen) & ~pdf[digest_col].duplicated()]
            seen.update(fresh[digest_col].tolist())
            yield fresh[out_cols]
        state.update((sorted(seen),))

    return bucketed.groupBy("__bucket").applyInPandasWithState(
        dedup, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def additive_upsert_sink(
    table_path: str, keys: list[str], counters: list[str]
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: merge each micro-batch delta into the parquet
    table at ``table_path`` (I3 semantics: matching keys add counters,
    new keys insert). Atomic via write-temp-then-swap.

    Exactly-once despite foreachBatch's at-least-once replay: the applied
    batch id is committed INSIDE the table directory (``_last_batch_id``,
    ignored by parquet readers), in the same atomic swap as the data — a
    replayed batch sees its own id and no-ops instead of double-adding.
    """

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        marker = os.path.join(table_path, "_last_batch_id")
        if os.path.exists(marker):
            with open(marker) as fh:
                if batch_id <= int(fh.read().strip()):
                    return  # replayed batch already applied
        if os.path.exists(table_path):
            existing = spark.read.parquet(table_path)
            merged = additive_upsert(existing, batch_df, keys=keys, counters=counters)
        else:
            merged = batch_df
        tmp = table_path + f"__tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_last_batch_id"), "w") as fh:
            fh.write(str(batch_id))
        if os.path.exists(table_path):
            shutil.rmtree(table_path)
        os.replace(tmp, table_path)

    return merge
