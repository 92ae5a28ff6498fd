"""Round-trip and layout tests for the unified multi-format IO layer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from citibike_deep_dive_spark.sources.formats import (
    SUPPORTED_FORMATS,
    infer_format,
    read_table,
    write_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from citibike_deep_dive_spark.plans import table

    # Stable subset with a timestamp, string, long, and double column.
    return table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("event_id").collect()]


@pytest.mark.parametrize("fmt", SUPPORTED_FORMATS)
def test_round_trip_preserves_rows(spark, tmp_path, events, fmt):
    path = str(tmp_path / f"events.{fmt}")
    write_table(events, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=events.schema)
    assert back.schema == events.schema
    assert _sorted_rows(back) == _sorted_rows(events)


def test_infer_format_from_extension():
    assert infer_format("/x/t.parquet") == "parquet"
    assert infer_format("/x/t.jsonl") == "json"
    assert infer_format("/x/t.orc/") == "orc"
    with pytest.raises(ValueError, match="cannot infer"):
        infer_format("/x/t.unknown")


def test_unsupported_format_rejected(spark, events, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(events, str(tmp_path / "t.avro"), fmt="avro")


def test_partitioned_write_prunes_on_read(spark, tmp_path, events):
    """Hive layout must reach the scan as PartitionFilters — the S11
    pruning index, format-agnostic."""
    path = str(tmp_path / "by_type.orc")
    write_table(
        events.withColumn("etype", F.col("event_type")),
        path,
        fmt="orc",
        partition_by=["etype"],
    )
    back = read_table(spark, path, fmt="orc").filter(F.col("etype") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(etype" in plan, plan[:1500]
    assert back.count() == events.filter(F.col("event_type") == "click").count()
