from __future__ import annotations

from pyspark.sql import functions as F

from citibike_deep_dive_spark.streaming.ingest import (
    read_event_stream,
    sessionize,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _stage_dir(tmp_path) -> str:
    """File stream sources need a directory; stage events.parquet into one."""
    d = tmp_path / "stream_src"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{SF_DIR}/events.parquet")
    return str(d)


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    stream = read_event_stream(spark, _stage_dir(tmp_path))
    assert stream.isStreaming
    q = (
        windowed_counts(stream)
        .writeStream.format("memory")
        .queryName("wc_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # batch equivalent over the same file
    from citibike_deep_dive_spark.plans.catalog import table

    ev = table(spark, SF_DIR, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("total_count"))
        .select(F.col("w.start").alias("window_start"), "event_type", "total_count")
    )
    got = {
        (r.window_start, r.event_type): r.total_count
        for r in spark.sql("SELECT * FROM wc_test").collect()
    }
    want = {(r.window_start, r.event_type): r.total_count for r in batch.collect()}
    # append mode only emits windows the watermark has closed; everything
    # emitted must match the batch result, and most windows should be there
    assert got
    for k, v in got.items():
        assert want[k] == v
    assert len(got) >= len(want) * 0.8


def test_sessionize_stream_runs(spark, tmp_path):
    stream = read_event_stream(spark, _stage_dir(tmp_path))
    q = (
        sessionize(stream)
        .writeStream.format("memory")
        .queryName("sess_test")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_test").collect()
    assert rows
    assert all(r.events_in_session >= 1 for r in rows)
    assert all(r.session_end >= r.session_start for r in rows)
