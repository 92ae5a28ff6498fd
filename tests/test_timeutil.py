"""Timestamp-flavor robustness: the events table's parquet TIMESTAMP_NANOS
column has been surfaced by Spark as bigint (pre-4.1, legacy conf) and as
TIMESTAMP_NTZ (4.1+). ts_micros must yield identical naive-epoch micros
for every flavor, under any session timezone — the r02 driver run proved
``unix_micros`` alone does not (AnalysisException on NTZ input)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from citibike_deep_dive_spark.functions.timeutil import ntz_from_nanos, ts_micros
from citibike_deep_dive_spark.plans.catalog import table

SF_DIR = "/root/testdata/sf0.001"

# 2024-01-01 00:09:58.778549 naive — first event row's wall clock.
KNOWN_MICROS = 1704067798778549


def test_events_reads_as_ntz_and_ts_micros_matches(spark):
    ev = table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    got = ev.orderBy("event_id").select(ts_micros(ev).alias("us")).first().us
    assert got == KNOWN_MICROS


def test_ts_micros_is_session_timezone_independent(spark):
    ev = table(spark, SF_DIR, "events")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        hostile = ev.orderBy("event_id").select(ts_micros(ev).alias("us")).first().us
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert hostile == KNOWN_MICROS


def test_ts_micros_bigint_flavor(spark):
    df = spark.createDataFrame([(KNOWN_MICROS * 1000,)], "ts bigint")
    assert df.select(ts_micros(df).alias("us")).first().us == KNOWN_MICROS


def test_ts_micros_bigint_flavor_is_exact_not_double(spark):
    # ns values near 1.7e18 exceed double's 53-bit exact range: float
    # division truncates to the wrong microsecond for ~12% of values.
    # This constant is one of them (ns % 1000 = 997 rounds the double up).
    ns = 1704067798778549997
    df = spark.createDataFrame([(ns,)], "ts bigint")
    assert df.select(ts_micros(df).alias("us")).first().us == ns // 1000


def test_ts_micros_bigint_flavor_floors_pre_epoch(spark):
    # Pre-epoch ns are negative; truncate-toward-zero (`div`) would give
    # -1704067798778549 for -...549997 ns, but floor semantics (matching
    # the NTZ reading and Python's //) give -...550. r4 ADVICE item.
    ns = -1704067798778549997
    df = spark.createDataFrame([(ns,)], "ts bigint")
    assert df.select(ts_micros(df).alias("us")).first().us == ns // 1000
    # and ntz_from_nanos agrees with ts_micros on the same value
    ntz = spark.createDataFrame([(ns,)], "raw bigint").select(
        ntz_from_nanos("raw").alias("ts")
    )
    assert ntz.select(ts_micros(ntz).alias("us")).first().us == ns // 1000


def test_ts_micros_ltz_flavor(spark):
    naive = datetime.datetime(2024, 1, 1, 0, 9, 58, 778549)
    df = spark.createDataFrame([(naive,)], "ts timestamp")
    # session tz is UTC, so the LTZ value's epoch equals the naive epoch
    assert df.select(ts_micros(df).alias("us")).first().us == KNOWN_MICROS


def test_ntz_from_nanos_roundtrip(spark):
    df = spark.createDataFrame([(KNOWN_MICROS * 1000,)], "raw bigint").select(
        ntz_from_nanos("raw").alias("ts")
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    assert df.select(ts_micros(df).alias("us")).first().us == KNOWN_MICROS
