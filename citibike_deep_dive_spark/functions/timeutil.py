"""Timestamp-type-robust time helpers.

The events table carries parquet TIMESTAMP_NANOS. How Spark surfaces it
has changed across releases: pre-4.1 it was readable only as ``bigint``
(legacy ``nanosAsLong`` conf), 4.1+ reads it natively as TIMESTAMP_NTZ
(micros-truncated). The DuckDB oracle reads the same column as a naive
timestamp. These helpers give every plan ONE way to get "microseconds
since the naive epoch" that is identical across all three readings and
independent of ``spark.sql.session.timeZone`` — ``unix_micros`` alone is
not (it rejects NTZ input outright, which is exactly the class of failure
that broke two catalog queries when the runtime upgraded under us).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Naive epoch as a TIMESTAMP_NTZ literal: string->NTZ cast never consults
# the session timezone, so this anchor is deterministic everywhere.
EPOCH_NTZ = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def ts_micros(df: DataFrame, colname: str = "ts") -> Column:
    """Microseconds since the (naive) epoch for ``df[colname]``, matching
    DuckDB's ``epoch_us(ts)`` on the same parquet bytes, whatever
    timestamp flavor this Spark version handed us."""
    dtype = dict(df.dtypes).get(colname)
    col = F.col(colname)
    if dtype == "timestamp_ntz":
        # timestampdiff(NTZ, NTZ) is pure wall-clock arithmetic: no
        # session-timezone reinterpretation, unlike cast(ts as timestamp).
        return F.expr(f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, {colname})")
    if dtype == "bigint":  # legacy nanosAsLong reading: ns since epoch
        # Integer FLOOR division, NOT `/`: `/` promotes to double, and ns
        # since epoch (~1.7e18) exceeds double's 53-bit exact range, so the
        # truncated microsecond comes out off-by-one for ~12% of values.
        # Plain `div` truncates toward zero, which diverges from the
        # floor-based NTZ reading for pre-epoch (negative) values, so
        # subtract the non-negative pmod remainder first: exact floor at
        # full int64 precision for any sign.
        return F.expr(f"({colname} - pmod({colname}, 1000)) div 1000")
    return F.unix_micros(col)


def ntz_from_nanos(colname: str) -> Column:
    """BIGINT ns-since-epoch -> TIMESTAMP_NTZ, timezone-independent
    (``timestamp_micros`` would mint an LTZ value instead). Floor division
    (via pmod) so pre-epoch values agree with ``ts_micros``."""
    return F.expr(
        f"timestampadd(MICROSECOND, ({colname} - pmod({colname}, 1000)) div 1000,"
        f" {EPOCH_NTZ})"
    )
