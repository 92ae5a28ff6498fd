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


def test_streaming_first_seen_dedup(spark, tmp_path):
    """applyInPandasWithState exact-dedup: first occurrence of each digest
    survives, across micro-batches; output digest set == batch-distinct."""
    from citibike_deep_dive_spark.streaming.stateful import streaming_first_seen

    stream = read_event_stream(spark, _stage_dir(tmp_path)).withColumn(
        "digest", F.md5(F.concat_ws(":", "event_type", (F.col("user_id") % 5)))
    )
    q = (
        streaming_first_seen(stream, digest_col="digest")
        .writeStream.format("memory")
        .queryName("dedup_test")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT digest FROM dedup_test").collect()
    digests = [r.digest for r in rows]
    assert len(digests) == len(set(digests)), "emitted duplicates"

    from citibike_deep_dive_spark.plans.catalog import table

    ev = table(spark, SF_DIR, "events").withColumn(
        "digest", F.md5(F.concat_ws(":", "event_type", (F.col("user_id") % 5)))
    )
    want = ev.select("digest").distinct().count()
    assert len(digests) == want


def test_additive_upsert_sink_matches_batch(spark, tmp_path):
    """foreachBatch I3 sink: after the stream drains, the parquet table
    equals the batch aggregate (windows still open at end are absent from
    append output, so compare on the emitted subset)."""
    from citibike_deep_dive_spark.streaming.stateful import additive_upsert_sink

    target = str(tmp_path / "counts_table")
    stream = read_event_stream(spark, _stage_dir(tmp_path))
    q = (
        windowed_counts(stream)
        .writeStream.foreachBatch(
            additive_upsert_sink(target, keys=["window_start", "event_type"],
                                 counters=["total_count"])
        )
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    from citibike_deep_dive_spark.plans.catalog import table

    ev = table(spark, SF_DIR, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("total_count"))
        .select(F.col("w.start").alias("window_start"), "event_type", "total_count")
    )
    want = {(r.window_start, r.event_type): r.total_count for r in batch.collect()}
    got = {
        (r.window_start, r.event_type): r.total_count
        for r in spark.read.parquet(target).collect()
    }
    assert got
    for k, v in got.items():
        assert want[k] == v


def test_additive_upsert_sink_replay_is_noop(spark, tmp_path):
    """foreachBatch replay guard: re-applying the same batch_id must not
    double-count (at-least-once delivery -> exactly-once table)."""
    from citibike_deep_dive_spark.streaming.stateful import additive_upsert_sink

    target = str(tmp_path / "replay_table")
    sink = additive_upsert_sink(target, keys=["k"], counters=["n"])
    delta = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "n"])
    sink(delta, 0)
    sink(delta, 0)  # replay of batch 0 -> no-op
    got = {r.k: r.n for r in spark.read.parquet(target).collect()}
    assert got == {"a": 1, "b": 2}
    sink(delta, 1)  # genuinely new batch -> adds
    got = {r.k: r.n for r in spark.read.parquet(target).collect()}
    assert got == {"a": 2, "b": 4}


def test_stream_static_enrichment(spark, tmp_path):
    from citibike_deep_dive_spark.streaming.ingest import enrich_stream_static

    dim = spark.createDataFrame(
        [(i, "tier%d" % (i % 3)) for i in range(200)], ["user_id", "tier"]
    )
    stream = read_event_stream(spark, _stage_dir(tmp_path))
    q = (
        enrich_stream_static(stream, dim, ["user_id"])
        .writeStream.format("memory")
        .queryName("enrich_test")
        .option("checkpointLocation", str(tmp_path / "ckpt5"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM enrich_test").collect()
    assert rows
    assert all(r.tier is not None for r in rows)

    from citibike_deep_dive_spark.plans.catalog import table

    assert len(rows) == table(spark, SF_DIR, "events").count()


def test_dedup_within_watermark(spark, tmp_path):
    from citibike_deep_dive_spark.streaming.ingest import dedup_within_watermark

    stream = read_event_stream(spark, _stage_dir(tmp_path)).withColumn(
        "digest", F.md5(F.concat_ws(":", "event_type", (F.col("user_id") % 5)))
    )
    q = (
        dedup_within_watermark(stream, ["digest"])
        .writeStream.format("memory")
        .queryName("wmdedup_test")
        .option("checkpointLocation", str(tmp_path / "ckpt6"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    digests = [r.digest for r in spark.sql("SELECT digest FROM wmdedup_test").collect()]
    assert len(digests) == len(set(digests))
    assert digests  # non-empty


def test_partitioned_upsert_sink_touches_only_delta_partitions(spark, tmp_path):
    """Scale form of the upsert sink (VERDICT r1): a micro-batch must
    rewrite ONLY the partitions its delta touches — untouched partition
    files stay byte-identical on disk — and replay stays a no-op."""
    import os

    from citibike_deep_dive_spark.streaming.stateful import partitioned_upsert_sink

    target = str(tmp_path / "ptable")
    sink = partitioned_upsert_sink(target, keys=["day", "k"], counters=["n"])

    b0 = spark.createDataFrame(
        [("d1", "a", 1), ("d1", "b", 2), ("d2", "c", 3)], ["day", "k", "n"]
    )
    sink(b0, 0)

    def files_in(part):
        d = os.path.join(target, f"day={part}")
        return {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    d1_before, d2_before = files_in("d1"), files_in("d2")

    # batch 1 touches only d2
    sink(spark.createDataFrame([("d2", "c", 10), ("d2", "d", 5)], ["day", "k", "n"]), 1)

    assert files_in("d1") == d1_before, "untouched partition d1 was rewritten"
    assert files_in("d2") != d2_before, "touched partition d2 was not rewritten"

    got = {(r.day, r.k): r.n for r in spark.read.parquet(target).collect()}
    assert got == {("d1", "a"): 1, ("d1", "b"): 2, ("d2", "c"): 13, ("d2", "d"): 5}

    # replay of batch 1 -> no-op everywhere
    d2_after = files_in("d2")
    sink(spark.createDataFrame([("d2", "c", 10)], ["day", "k", "n"]), 1)
    assert files_in("d2") == d2_after
    got = {(r.day, r.k): r.n for r in spark.read.parquet(target).collect()}
    assert got[("d2", "c")] == 13


def test_partitioned_upsert_sink_rejects_bad_partition_col(spark):
    import pytest as _pytest

    from citibike_deep_dive_spark.streaming.stateful import partitioned_upsert_sink

    with _pytest.raises(ValueError):
        partitioned_upsert_sink("/tmp/x", keys=["k"], counters=["n"], partition_col="z")


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    from citibike_deep_dive_spark.streaming.ingest import attribute_conversions

    src = _stage_dir(tmp_path)
    clicks = read_event_stream(spark, src).filter(F.col("event_type") == "click")
    purchases = read_event_stream(spark, src).filter(
        F.col("event_type") == "purchase"
    )
    q = (
        attribute_conversions(clicks, purchases)
        .writeStream.format("memory")
        .queryName("ssj_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    from citibike_deep_dive_spark.plans.catalog import table

    ev = table(spark, SF_DIR, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        (r.click_id, r.purchase_id)
        for r in c.join(
            p,
            F.expr(
                "c_user = p_user AND purchase_ts >= click_ts "
                "AND purchase_ts <= click_ts + INTERVAL 10 minutes"
            ),
        ).collect()
    }
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM ssj_test").collect()
    }
    # append mode may hold back pairs the watermark hasn't closed, but with
    # availableNow over a finite file the final watermark releases them all
    assert got == want and len(want) > 0


def test_sliding_windowed_counts_stream_matches_batch(spark, tmp_path):
    """Sliding (1h window / 15m slide) streaming counts must equal the
    batch sliding-window analog (the sliding_window_counts catalog
    entry's shape): 4 overlapping windows per event, watermark-bounded
    state."""
    stream = read_event_stream(spark, _stage_dir(tmp_path))
    q = (
        windowed_counts(stream, slide="15 minutes")
        .writeStream.format("memory")
        .queryName("slide_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_slide"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    from citibike_deep_dive_spark.plans.catalog import table

    ev = table(spark, SF_DIR, "events")
    want = {
        (r.window_start, r.event_type, r.total_count)
        for r in ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("total_count"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "total_count"
        )
        .collect()
    }
    got = {
        (r.window_start, r.event_type, r.total_count)
        for r in spark.sql("SELECT * FROM slide_test").collect()
    }
    # append-mode emits only watermark-closed windows: a subset, and every
    # emitted window must carry the exact batch count.
    assert got, "no sliding windows emitted"
    assert got <= want
    batch_by_key = {(w, t): c for (w, t, c) in want}
    for w, t, c in got:
        assert batch_by_key[(w, t)] == c


def test_stream_stream_left_outer_interval_join_emits_unmatched(spark, tmp_path):
    """LEFT OUTER interval join: an unattributed purchase must emit with
    null click columns once the watermark passes its horizon — the
    late-but-complete attribution semantics inner joins can't give."""
    import datetime as dt

    from citibike_deep_dive_spark.streaming.ingest import attribute_conversions

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)  # naive wall clock, like events.ts
    rows = [
        # matched pair: click then purchase 5 min later (user 1)
        (1, t0, 1, "click", 1.0, None),
        (2, t0 + dt.timedelta(minutes=5), 1, "purchase", 9.9, None),
        # unmatched purchase (user 2, no click at all)
        (3, t0 + dt.timedelta(minutes=7), 2, "purchase", 5.0, None),
        # far-future events on BOTH types push both watermarks way past t0
        (4, t0 + dt.timedelta(days=2), 3, "click", 0.0, None),
        (5, t0 + dt.timedelta(days=2), 3, "purchase", 0.0, None),
    ]
    src = tmp_path / "lo_src"
    src.mkdir()
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).write.parquet(str(src / "events.parquet"))

    # write.parquet made a DIRECTORY; the file stream source doesn't
    # recurse into non-partition subdirs, so point it at that dir itself.
    stream = read_event_stream(spark, str(src / "events.parquet"))
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    q = (
        attribute_conversions(clicks, purchases, how="left_outer")
        .writeStream.format("memory")
        .queryName("lo_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_lo"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM lo_test").collect()
    }
    assert (2, 1) in got  # attributed purchase
    assert (3, None) in got  # unmatched purchase emitted with null click


def test_streaming_first_seen_rocksdb_backend(spark, tmp_path):
    """Same first-seen dedup, state held by the RocksDB provider (the
    100 TB state path: disk-backed store + changelog checkpoints instead
    of JVM-heap HDFSBacked state). Provider is read per-query at start,
    so a conf set/restore around .start() scopes it to this query."""
    from citibike_deep_dive_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        rocksdb_state_conf,
        streaming_first_seen,
    )

    stream = read_event_stream(spark, _stage_dir(tmp_path)).withColumn(
        "digest", F.md5(F.concat_ws(":", "event_type", (F.col("user_id") % 7)))
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    for k, v in rocksdb_state_conf().items():
        spark.conf.set(k, v)
    try:
        q = (
            streaming_first_seen(stream, digest_col="digest", prefix_width=3)
            .writeStream.format("memory")
            .queryName("dedup_rocks")
            .option("checkpointLocation", str(tmp_path / "ckpt_rocks"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.lastProgress["stateOperators"][0]["customMetrics"].get(
            "rocksdbSstFileSize", None
        ) is not None or ROCKSDB_PROVIDER in str(
            spark.conf.get(key)
        ), "RocksDB provider not active"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    digests = [r.digest for r in spark.sql("SELECT digest FROM dedup_rocks").collect()]
    assert len(digests) == len(set(digests)), "emitted duplicates"

    from citibike_deep_dive_spark.plans.catalog import table

    ev = table(spark, SF_DIR, "events").withColumn(
        "digest", F.md5(F.concat_ws(":", "event_type", (F.col("user_id") % 7)))
    )
    assert len(digests) == ev.select("digest").distinct().count()


def test_streaming_quota_gate_caps_per_key(spark, tmp_path):
    """transformWithStateInPandas per-key quota: across micro-batches each
    event_type emits exactly min(quota, total) rows, every emitted row is
    a real input row, and no duplicates are admitted."""
    from citibike_deep_dive_spark.streaming.stateful import streaming_quota_gate

    # Stage as 8 part files -> availableNow with maxFilesPerTrigger=4
    # processes them in 2 micro-batches, exercising cross-batch state.
    src = tmp_path / "quota_src"
    full = spark.read.parquet(f"{SF_DIR}/events.parquet")
    full.repartition(8).write.parquet(str(src / "events.parquet"))

    stream = read_event_stream(spark, str(src / "events.parquet"))
    quota = 100
    q = (
        streaming_quota_gate(stream, key_col="event_type", quota=quota)
        .writeStream.format("memory")
        .queryName("quota_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_quota"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql("SELECT * FROM quota_test").collect()
    got = {}
    ids = set()
    for r in out:
        got[r.event_type] = got.get(r.event_type, 0) + 1
        ids.add(r.event_id)
    assert len(ids) == len(out), "duplicate rows admitted"
    want = {
        r.event_type: min(quota, r.n)
        for r in full.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
    valid_ids = {r.event_id for r in full.select("event_id").collect()}
    assert ids <= valid_ids


def test_streaming_quota_gate_tws_requires_protobuf(spark):
    """The TWS variant either works (protobuf present) or fails fast with
    a clear error — never a mid-query worker crash."""
    import pytest

    from citibike_deep_dive_spark.streaming.stateful import streaming_quota_gate_tws

    try:
        import google.protobuf  # noqa: F401
        pytest.skip("protobuf available; TWS covered by cluster runs")
    except ImportError:
        pass
    df = spark.readStream.format("rate").load()
    with pytest.raises(RuntimeError, match="protobuf"):
        streaming_quota_gate_tws(df, "value", 10)


def test_streaming_dsir_model_matches_batch(spark, tmp_path):
    """Incremental DSIR: the (bucket, tc, rc) model is additive, so
    maintaining it with additive_upsert_sink over document micro-batches
    must reproduce the batch model exactly — and scoring docs against
    the streamed model must equal the catalog query's weights."""
    from citibike_deep_dive_spark.plans.round8 import (
        dsir_doc_buckets,
        dsir_model,
        dsir_weights,
    )
    from citibike_deep_dive_spark.streaming.stateful import additive_upsert_sink

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # stage the corpus as three parquet slices -> three file-stream batches
    src = tmp_path / "docs_stream"
    src.mkdir()
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            str(src / f"slice_{i}.parquet")
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*.parquet"))
    )

    target = str(tmp_path / "dsir_model")
    sink = additive_upsert_sink(target, keys=["bucket"], counters=["tc", "rc"])

    def merge_model(batch_df, batch_id):
        sink(dsir_model(dsir_doc_buckets(batch_df)), batch_id)

    q = (
        stream.writeStream.foreachBatch(merge_model)
        .option("checkpointLocation", str(tmp_path / "ckpt_dsir"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed_model = spark.read.parquet(target).select("bucket", "tc", "rc")
    batch_model = dsir_model(dsir_doc_buckets(docs))
    want = {r["bucket"]: (r["tc"], r["rc"]) for r in batch_model.collect()}
    got = {r["bucket"]: (r["tc"], r["rc"]) for r in streamed_model.collect()}
    assert got == want

    bg = dsir_doc_buckets(docs)
    w_stream = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_weights(bg, streamed_model).collect()
    }
    w_batch = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_weights(bg, batch_model).collect()
    }
    assert w_stream == w_batch


def test_streaming_chunk_dedup_first_seen_matches_batch_digests(spark, tmp_path):
    """Streaming chunk-grain dedup: explode the doc stream into 16-word
    chunks (the batch chunk_frame definition) and keep first-seen per
    digest. Ownership ORDER differs from the batch form (arrival vs min
    (doc_id, pos)) but the INVARIANT is the same: exactly one kept
    chunk per distinct digest, covering all distinct digests."""
    from citibike_deep_dive_spark.plans.round8 import chunk_frame
    from citibike_deep_dive_spark.streaming.stateful import streaming_first_seen

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = tmp_path / "docs_stream_chunks"
    src.mkdir()
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            str(src / f"slice_{i}.parquet")
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*.parquet"))
    )
    target = str(tmp_path / "kept_chunks")
    q = (
        streaming_first_seen(chunk_frame(stream), digest_col="digest")
        .writeStream.format("parquet")
        .option("path", target)
        .option("checkpointLocation", str(tmp_path / "ckpt_chunks"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    kept = spark.read.parquet(target)
    batch_digests = {
        r["digest"] for r in chunk_frame(docs).select("digest").distinct().collect()
    }
    kept_rows = kept.count()
    kept_digests = {r["digest"] for r in kept.select("digest").collect()}
    assert kept_rows == len(batch_digests)
    assert kept_digests == batch_digests


def test_streaming_sprt_monitor_matches_batch(spark, tmp_path):
    """The streaming SPRT monitor over time-ordered micro-batches must
    reproduce the batch ab_sequential_sprt query exactly: same final
    LLR, same decision, same crossing timestamp."""
    import json

    from citibike_deep_dive_spark.plans import CATALOG
    from citibike_deep_dive_spark.plans.round8f import (
        _SPRT_A,
        _SPRT_I0,
        _SPRT_I1,
        _SPRT_SCALE,
    )
    from citibike_deep_dive_spark.streaming.stateful import sprt_monitor_sink

    [batch] = CATALOG["ab_sequential_sprt"].build(spark, SF_DIR).collect()

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type").isin("click", "view"))
        .select("ts", "event_id", "event_type")
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3

    # three TIME-ORDERED slices -> three in-order micro-batches
    src = tmp_path / "sprt_stream"
    src.mkdir()
    for i in range(3):
        a = lo + span * i
        b = hi if i == 2 else lo + span * (i + 1)
        cond = (F.col("ts") >= a) & ((F.col("ts") <= b) if i == 2 else (F.col("ts") < b))
        ev.filter(cond).coalesce(1).write.parquet(str(src / f"slice_{i}.parquet"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*.parquet"))
    )
    state_path = str(tmp_path / "sprt_state.json")
    sink = sprt_monitor_sink(state_path, bound=_SPRT_A)

    def step(batch_df, batch_id):
        inc = batch_df.select(
            "ts",
            "event_id",
            F.when(F.col("event_type") == "click", F.lit(_SPRT_I1))
            .otherwise(F.lit(_SPRT_I0))
            .alias("inc"),
        )
        sink(inc, batch_id)

    q = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", str(tmp_path / "ckpt_sprt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    with open(state_path) as fh:
        state = json.load(fh)
    assert state["n_events"] == batch["n_events"]
    assert round(state["total"] / _SPRT_SCALE, 6) == batch["final_llr"]
    assert (state["decision"] or "continue") == batch["decision"]
    if batch["decision"] != "continue":
        assert state["crossed_at"].startswith(batch["crossed_at"][:19]) or \
            state["crossed_at"][:19] == batch["crossed_at"]
        assert round(state["llr_at_crossing"] / _SPRT_SCALE, 6) == batch["llr_at_crossing"]

    # replaying the last batch id must be a no-op (exactly-once)
    before = json.dumps(state, sort_keys=True)
    sink(
        spark.createDataFrame(
            [(hi, 10**9, _SPRT_I1)], "ts timestamp, event_id long, inc long"
        ),
        state["batch_id"],
    )
    with open(state_path) as fh:
        after = json.dumps(json.load(fh), sort_keys=True)
    assert after == before
