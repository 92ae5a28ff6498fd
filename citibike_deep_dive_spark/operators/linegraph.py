"""LineGraphTable maintenance (A1 + I4).

Reference: per (year, month) conditional user-type counts, appended
blindly per ingested file (citibike_data_process/table_updating/
update_linegraph.py:8-43; DDL table_list.py:13-19).

Spark shape: one hash aggregation with map-side partial combine; the
conditional counts are count(CASE WHEN …) so no extra pass per user type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linegraph_aggregate(trips: DataFrame) -> DataFrame:
    """Per (year, month): subscriber_count / customer_count (A1)."""
    return (
        trips.groupBy("year", "month")
        .agg(
            F.count(F.when(F.col("user_type") == "subscriber", 1)).alias(
                "subscriber_count"
            ),
            F.count(F.when(F.col("user_type") == "customer", 1)).alias(
                "customer_count"
            ),
        )
    )


def linegraph_update(existing: DataFrame | None, trips: DataFrame) -> DataFrame:
    """I4 append semantics: new-file aggregates are appended, never merged
    (the StatusData gate is the only double-append guard — preserved)."""
    delta = linegraph_aggregate(trips)
    if existing is None:
        return delta
    return existing.unionByName(delta)
