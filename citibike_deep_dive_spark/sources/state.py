"""StatusData ingestion state machine (I1/I2, J7, S12).

Reference: citibike_data_process/data_processing/ingestion/new_file_check.py
+ table_updating/update_status_data.py. One row per year:
(year INT, month INT|NULL, complete BOOL) — a monthly file sets
(year, month, complete=false); a yearly file sets (year, NULL, true).
A candidate is NEW iff no state row covers it:
- covered if its year is marked complete,
- covered if monthly and state.month >= candidate.month for that year.

This is the batch analog of Structured Streaming's file-source seen-files
log (SURVEY.md §2.10 I1). The state table is tiny (one row/year), so the
diff is driver-side; persistence is a small Parquet table.

Reference bugs fixed, not replicated (SURVEY.md §7): the walrus-shadowing
listcomp and the ``False``-instead-of-empty-list return
(new_file_check.py:15-20,45).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .discovery import CandidateFile

STATE_SCHEMA = T.StructType(
    [
        T.StructField("year", T.IntegerType(), False),
        T.StructField("month", T.IntegerType(), True),
        T.StructField("complete", T.BooleanType(), False),
    ]
)


@dataclass(frozen=True)
class YearState:
    year: int
    month: int | None
    complete: bool


def load_state(spark: SparkSession, path: str) -> dict[int, YearState]:
    """S12-style existence probe + load: empty dict if the table doesn't
    exist yet (spark.catalog.tableExists analog for a path table)."""
    try:
        rows = spark.read.schema(STATE_SCHEMA).parquet(path).collect()
    except Exception:
        return {}
    return {r.year: YearState(r.year, r.month, r.complete) for r in rows}


def save_state(spark: SparkSession, state: dict[int, YearState], path: str) -> None:
    rows = [(s.year, s.month, s.complete) for s in state.values()]
    spark.createDataFrame(rows, STATE_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def new_files(
    candidates: list[CandidateFile], state: dict[int, YearState]
) -> list[CandidateFile]:
    """I1 diff: candidates not yet covered by state, chronological order.

    Returns an empty list (never ``False``) when everything is covered.
    """
    out = []
    for cand in candidates:
        st = state.get(cand.year)
        if st is None:
            out.append(cand)
        elif st.complete:
            continue  # year fully ingested (yearly archive seen)
        elif cand.month is None or st.month is None or cand.month > st.month:
            out.append(cand)
    return sorted(out, key=lambda f: f.sort_key)


def advance_state(
    state: dict[int, YearState], processed: CandidateFile
) -> dict[int, YearState]:
    """I2 upsert: yearly file → (month=None, complete=true); monthly file →
    (month=max seen, complete=false). One row per year invariant."""
    new = dict(state)
    if processed.month is None:
        new[processed.year] = YearState(processed.year, None, True)
    else:
        prev = state.get(processed.year)
        month = processed.month
        if prev is not None and prev.month is not None:
            month = max(prev.month, processed.month)
        complete = prev.complete if prev else False
        new[processed.year] = YearState(processed.year, month, complete)
    return new
