"""HeatMapTable maintenance (A2 + J2/J4 additive upsert).

Reference: per (year, month, hour) ride counts merged into the main table
with UPDATE-add + anti-join INSERT (citibike_data_process/table_updating/
update_heatmap.py:8-64; DDL table_list.py:24-31).

Note: the reference computes hour as zero-padded TEXT via strftime('%H')
then stores into an INTEGER column; Spark's hour() yields the integer
directly — same stored value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .upsert import additive_upsert


def heatmap_aggregate(trips: DataFrame) -> DataFrame:
    """Per (year, month, hour-of-start): total_count (A2)."""
    return (
        trips.withColumn("hour", F.hour("start_time"))
        .groupBy("year", "month", "hour")
        .agg(F.count("*").alias("total_count"))
    )


def heatmap_update(existing: DataFrame | None, trips: DataFrame) -> DataFrame:
    """I3 additive merge of the new file's counts into the main table."""
    delta = heatmap_aggregate(trips)
    if existing is None:
        return delta
    return additive_upsert(
        existing, delta, keys=["year", "month", "hour"], counters=["total_count"]
    )
