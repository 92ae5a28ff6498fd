"""Spark ↔ DuckDB parity for every catalog query (the driver's t2 gate,
run locally at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from citibike_deep_dive_spark.plans import CATALOG

from tests.oracle_harness import compare, duckdb_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


SQL_BACKED = [name for name, spec in CATALOG.items() if spec.oracle is not None]
ROWS_ONLY = [name for name, spec in CATALOG.items() if spec.oracle is None]


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle(spark, duck, name):
    spec = CATALOG[name]
    df = spec.build(spark, SF_DIR)
    problems = compare(df, duck, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = CATALOG[name]
    df = spec.build(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
