"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a catalog query through Spark AND its oracle SQL through DuckDB on
the same parquet tables, then compares row-count + column names + values
(order-insensitive, float-tolerant). Stricter than the driver in spirit:
any diff here fails before the driver sees it.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def compare(spark_df, con, oracle_sql: str) -> list[str]:
    """Return a list of human-readable diffs (empty == parity)."""
    problems: list[str] = []
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    rel = con.sql(oracle_sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    order = sorted(spark_cols)
    s_set = sorted(
        tuple(_norm(row[c]) for c in order) for row in (r.asDict() for r in spark_rows)
    )
    d_idx = [duck_cols.index(c) for c in order]
    d_set = sorted(tuple(_norm(row[i]) for i in d_idx) for row in duck_rows)
    if s_set != d_set:
        for s, d in zip(s_set, d_set):
            if s != d:
                problems.append(f"first value diff:\n  spark={s}\n  duck ={d}")
                break
        else:
            problems.append(
                f"value sets differ in tail (spark {len(s_set)} vs duck {len(d_set)} rows)"
            )
    return problems
