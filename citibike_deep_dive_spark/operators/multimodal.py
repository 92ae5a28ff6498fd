"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata (BASELINE.json north star).

The Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is real and tested; the actual media decoding is STUBBED (the image/audio
libraries are not in this container): ``decode_stub`` raises
NotImplementedError unless ``deterministic_fake=True``, which produces a
seeded fake feature vector from the bytes (md5-derived), keeping every
downstream operator testable.

Scale notes: media blobs ride in parquet binary columns; mapInPandas
processes them in Arrow batches (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch), so executor memory holds a
batch of blobs, never a partition of decoded frames. Feature extraction
parallelism is pure data parallelism — no shuffle until the (tiny)
feature output is aggregated.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents`` (the container
    has no real media): payload = utf-8 bytes of text, metadata from
    lengths. Exercises the binary-column path end to end."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.length("text").cast("int").alias("meta_width"),
        (F.col("n_chars") % 1024).cast("int").alias("meta_height"),
        (F.col("n_chars") * 40).cast("int").alias("meta_duration_ms"),
    )


def decode_stub(payload: bytes, kind: str, deterministic_fake: bool = False) -> list[float]:
    """STUB decode/feature-extract. Real implementation would dispatch to
    PIL/torchaudio/ffmpeg per ``kind``; those libs are absent here."""
    if not deterministic_fake:
        raise NotImplementedError(
            f"media decoding for kind={kind!r} requires codec libraries "
            "not present in this environment; pass deterministic_fake=True"
        )
    digest = hashlib.md5(payload).digest()
    return [round(b / 255.0, 6) for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "digest": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
                    "features": pdf.apply(
                        lambda r: decode_stub(
                            r["payload"], r["kind"], deterministic_fake=deterministic_fake
                        ),
                        axis=1,
                    ),
                }
            )
            yield out

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame timestamp.

    The timestamp fan-out is native (sequence + explode); actual frame
    decode would plug into extract_features. Demonstrates the
    explode-then-process shape used for video corpora.
    """
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta_duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
