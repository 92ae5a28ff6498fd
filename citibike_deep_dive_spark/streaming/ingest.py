"""Streaming ingest: the reference's file-batch incrementality as
Structured Streaming.

The reference's StatusDataTable + per-file loop (SURVEY.md I1-I4) is a
hand-rolled version of what Structured Streaming gives natively: the file
source's seen-files log (= StatusData), watermarked windowed aggregation
(= per-period counts), and idempotent sinks via checkpointing (= the
double-append guard).

These builders return streaming DataFrames; callers attach writeStream
with a checkpoint dir. Tested with trigger(availableNow=True) against the
batch equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # parquet TIMESTAMP_NANOS: Spark 4.1+ reads it as NTZ
        # (micros-truncated), matching the batch-side table() reading.
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path_glob: str) -> DataFrame:
    """File-source stream over event parquet files. The source's log of
    processed files replaces the reference's StatusDataTable diff (I1).

    ``ts`` is cast NTZ -> TIMESTAMP because watermarks require an LTZ
    event-time column (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise).
    session.py pins the session timezone to UTC, so the cast is a pure
    relabeling — wall-clock values are unchanged."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path_glob)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, overlapping sliding) window per-type
    counts with late-data watermark — the streaming analog of
    HeatMapTable's (year, month, hour) counts (A2/I3): state-store merge
    replaces the UPDATE-add + anti-insert pair. Sliding mode keeps
    window/slide windows of state per key, still watermark-bounded."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("total_count"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "total_count",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based) — the stateful custom-operator
    pattern (applyInPandasWithState alternative: built-in session_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("events_in_session"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "events_in_session",
        )
    )


def enrich_stream_static(stream: DataFrame, dim: DataFrame, keys: list[str]) -> DataFrame:
    """Stream-static join: every micro-batch joins against the (small)
    static dimension — broadcast, so the stream never shuffles. The
    streaming analog of the pipeline's J5 enrichment joins."""
    return stream.join(F.broadcast(dim), keys, "left")


def dedup_within_watermark(
    stream: DataFrame, cols: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """Built-in streaming dedup: drops repeats of ``cols`` arriving within
    the watermark horizon — bounded state, unlike dropDuplicates' forever
    state. Complements the custom applyInPandasWithState first-seen
    operator (stateful.streaming_first_seen) which never expires."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(cols)


def attribute_conversions(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: attribute each purchase to
    the same user's click(s) within ``horizon`` before it.

    Both sides carry watermarks and the join condition bounds the event
    times on BOTH sides, so Spark can expire buffered state — the state
    store holds at most (watermark + horizon) of either stream per key,
    regardless of total stream length. The batch analog is the
    conversion_funnel catalog entry.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    joined = p.join(
        c,
        F.expr(
            f"""
            c_user = p_user
            AND purchase_ts >= click_ts
            AND purchase_ts <= click_ts + INTERVAL {horizon}
            """
        ),
        how,
    )
    # ``how="left_outer"`` makes PURCHASES the preserved side: an
    # unattributed purchase emits (null click) once the watermark passes
    # its join horizon — bounded state, late-but-complete semantics.
    return joined.select(
        F.col("p_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
    )
