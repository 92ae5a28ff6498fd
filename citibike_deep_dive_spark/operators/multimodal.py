"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata (BASELINE.json north star).

The Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is real and tested. Image METADATA decode is also real:
``parse_image_dimensions`` reads PNG/GIF/JPEG/BMP headers with pure
Python (no codec libraries needed), and ``image_dimensions`` runs it as
an Arrow-batched operator, so ``meta_width``/``meta_height`` come from
actual payload bytes. Full pixel/audio/video decoding stays STUBBED
(those libs are not in this container): ``decode_stub`` raises
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def parse_image_dimensions(payload: bytes) -> tuple[str, int, int] | None:
    """REAL image metadata decode, pure Python: (format, width, height)
    from the container header bytes, or None if the payload is not a
    recognized image. Formats: PNG (IHDR), GIF (logical screen), JPEG
    (SOF segment walk), BMP (BITMAPINFOHEADER)."""
    if len(payload) >= 24 and payload[:8] == _PNG_MAGIC and payload[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        # walk marker segments to the first SOFn (C0-CF minus C4/C8/CC)
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    "jpeg",
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                )
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        return None
    if len(payload) >= 26 and payload[:2] == b"BM":
        return (
            "bmp",
            int.from_bytes(payload[18:22], "little", signed=True),
            abs(int.from_bytes(payload[22:26], "little", signed=True)),
        )
    return None


IMAGE_DIMS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def image_dimensions(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL header decode: meta from payload bytes, null
    columns for unrecognized payloads (rows are kept — corpus triage
    wants to count the undecodable, not silently drop them)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["payload"].map(
                lambda b: parse_image_dimensions(bytes(b)) if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fmt": parsed.map(lambda t: t[0] if t else None),
                    "width": parsed.map(lambda t: t[1] if t else None),
                    "height": parsed.map(lambda t: t[2] if t else None),
                }
            )

    return media.mapInPandas(run, IMAGE_DIMS_SCHEMA)


def parse_wav_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """REAL audio metadata decode, pure Python: (channels, sample_rate,
    bits_per_sample, duration_ms) from a canonical 44-byte RIFF/WAVE PCM
    header, or None if the payload is not a recognized WAV. The audio
    sibling of ``parse_image_dimensions`` — header triage needs no codec
    library, only the PCM SAMPLES would (those stay behind decode_stub)."""
    if len(payload) < 44:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    if payload[12:16] != b"fmt " or payload[36:40] != b"data":
        return None
    channels = int.from_bytes(payload[22:24], "little")
    sample_rate = int.from_bytes(payload[24:28], "little")
    bits = int.from_bytes(payload[34:36], "little")
    data_size = int.from_bytes(payload[40:44], "little")
    byte_rate = sample_rate * channels * bits // 8
    if byte_rate <= 0:
        return None
    return (channels, sample_rate, bits, data_size * 1000 // byte_rate)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate_hz", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def audio_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL WAV header decode: meta from payload bytes,
    null columns for unrecognized payloads (kept, not dropped — same
    triage contract as ``image_dimensions``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["payload"].map(
                lambda b: parse_wav_header(bytes(b)) if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "channels": parsed.map(lambda t: t[0] if t else None),
                    "sample_rate_hz": parsed.map(lambda t: t[1] if t else None),
                    "bits_per_sample": parsed.map(lambda t: t[2] if t else None),
                    "duration_ms": parsed.map(lambda t: t[3] if t else None),
                }
            )

    return media.mapInPandas(run, AUDIO_META_SCHEMA)


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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("dst_width", T.IntegerType()),
        T.StructField("dst_height", T.IntegerType()),
        T.StructField("scale", T.DoubleType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_stub(payload: bytes, dst_w: int, dst_h: int, deterministic_fake: bool = False) -> bytes:
    """STUB pixel resample (PIL absent here). The deterministic fake
    emits a payload whose length tracks the target pixel count so
    downstream size accounting is exercised for real."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image resampling requires codec libraries not present in "
            "this environment; pass deterministic_fake=True"
        )
    seed = hashlib.md5(payload + b"%dx%d" % (dst_w, dst_h)).digest()
    reps = max(1, (dst_w * dst_h) // (16 * 64))
    return (seed * reps)[: max(16, reps * 16)]


def resize_images(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Aspect-preserving batch resize (fit-within-box, never upscale) over
    binary image payloads — the multimodal preprocessing step between
    decode and feature extraction. The GEOMETRY is real and runs in
    Python only because the pixel work would: scale = min(tw/w, th/h, 1),
    output dims floor(scale * src) with a 1px floor. Arrow batches bound
    executor memory to a batch of payloads; output is again a binary
    column, so resize chains with extract_features / frame sampling
    without leaving the DataFrame. Only image rows with parsed header
    dims are touched — the kind + non-null-meta filters prune at the
    scan (a failed header parse yields null meta, and a null dim has no
    meaningful resize geometry)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["meta_width"].astype("int64").clip(lower=1)
            h = pdf["meta_height"].astype("int64").clip(lower=1)
            scale = (target_w / w).combine(target_h / h, min).clip(upper=1.0)
            dst_w = (w * scale).astype("int64").clip(lower=1).astype("int32")
            dst_h = (h * scale).astype("int64").clip(lower=1).astype("int32")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "src_width": w.astype("int32"),
                    "src_height": h.astype("int32"),
                    "dst_width": dst_w,
                    "dst_height": dst_h,
                    "scale": scale.round(6),
                    "payload": [
                        resize_stub(p, int(dw), int(dh), deterministic_fake)
                        for p, dw, dh in zip(pdf["payload"], dst_w, dst_h)
                    ],
                }
            )

    return media.filter(
        (F.col("kind") == "image")
        & F.col("meta_width").isNotNull()
        & F.col("meta_height").isNotNull()
    ).mapInPandas(run, RESIZED_SCHEMA)
