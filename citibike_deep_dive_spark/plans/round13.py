"""Round-13 batch: the r12 codec family lands on the oracle-checked
catalog surface (VERDICT r12 item 1), plus the staged FFT consumer
(item 8 stretch: VAD-style frame-energy gating).

Every query here pairs a REAL byte-level codec round trip executed
executor-side with a DuckDB oracle that recomputes the identical
statistics ARITHMETICALLY from the generating formulas — the
``multimodal_png_pixel_stats`` pattern (plans/round10.py): the oracle
never touches bytes, so a matching value hash proves the encoder, the
binary column, the Arrow batch boundary, the decoder, and the stats
plan all compose exactly.

- GIF / TIFF / FLAC / AU(16-bit PCM) are LOSSLESS formats — stats of
  encode->decode are exact functions of the synthesis formula.
- G.711 mu-law is LOSSY but DETERMINISTIC pure-integer segment
  arithmetic (ITU-T G.711) — the oracle recomputes the full
  encode->decode companding round trip in SQL.
- MJPEG/AVI frames are lossy (JPEG), so the video query pins the
  STRUCTURAL surface (frame grid, sampling stride, timestamps, dims)
  that is formula-exact, exactly as COVERAGE.md staged it.
- The VAD query gates the already-verified fixed-point STFT frame
  track (plans/round12.py machinery, literal Hann + twiddles, exact
  integers end to end) and segments active frames with two narrow
  windows over a 7-row-per-clip grain.

All sums are exact int64/HUGEINT; means are one IEEE division; every
shift is an arithmetic floor shift with identical semantics on Spark
4.1 and DuckDB 1.0 (the r12 determinism contract, SCALE.md).

Scale shape: every synthesizer/decoder stage is Arrow-batched per-row
map work with zero shuffle; the only exchanges anywhere in this module
are the media_id hash partition for the two VAD windows (7 rows per
clip) — audited in PLANS.md.

Reference codec lineage: reference has no media path at all (1,481 LoC
of DuckDB orchestration over CSV zips); these queries extend the
training-data pipeline surface the brief mandates (multimodal columns
as opaque binaries + typed metadata).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.fanout import fan_out
from .catalog import register, table
from .round12 import (
    FFT_FEATURES_SCHEMA,
    _FFT_BITREV,
    _FFT_BITS,
    _FFT_N,
    _FFT_SCALE_BITS,
    _STFT_CLIP,
    _STFT_FRAMES,
    _STFT_HANN,
    _STFT_HOP,
    _duck_list_sql,
    _duck_stage_cte,
    fft_feature_frame,
    fft_power_bins,
)

_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

# ---------------------------------------------------------------------------
# GIF pixel stats — lossless LZW round trip, palette-formula oracle
# ---------------------------------------------------------------------------

_GIF_W_MOD, _GIF_H_MOD, _GIF_K_MOD = 9, 5, 6

# palette index and channel formulas (BIGINT-safe, fully parenthesized)
_GIF_P = "((media_id * 37 + idx * 11 + 3) % k)"


def _gif_chan(c: int) -> str:
    return (
        f"((((media_id % 100003) * 131 + {_GIF_P} * 8191 + {c} * 2029 + 7)"
        f" % 65536) * 25173 + 13849) % 65536 % 256"
    )


def synthesize_gif_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload): one REAL GIF per document — a K-color
    palette (K = id%6+2) filled from an LCG, pixels indexed by a second
    LCG, through the pure-Python LZW ``encode_gif`` writer. Arrow-
    batched per-row work, no shuffle."""
    import numpy as np

    from ..operators.codecs import encode_gif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                w = mid % _GIF_W_MOD + 2
                h = mid % _GIF_H_MOD + 2
                k = mid % _GIF_K_MOD + 2
                pal = np.stack(
                    [
                        ((((mid % 100003) * 131 + np.arange(k, dtype=np.int64) * 8191
                           + c * 2029 + 7) % 65536) * 25173 + 13849) % 65536 % 256
                        for c in (0, 1, 2)
                    ],
                    axis=1,
                ).astype(np.uint8)
                idx = np.arange(h * w, dtype=np.int64)
                pidx = (mid * 37 + idx * 11 + 3) % k
                payloads.append(encode_gif(pal[pidx].reshape(h, w, 3)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, _MEDIA_SCHEMA)


@register(
    "multimodal_gif_pixel_stats",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(doc_id % {_GIF_W_MOD} + 2 AS BIGINT) AS w,
               CAST(doc_id % {_GIF_H_MOD} + 2 AS BIGINT) AS h,
               CAST(doc_id % {_GIF_K_MOD} + 2 AS BIGINT) AS k
        FROM documents
    ),
    px AS (
        SELECT media_id, w, h, k,
               unnest(generate_series(0, w * h - 1)) AS idx
        FROM dims
    ),
    chan AS (
        SELECT media_id, w, h, idx,
               {_gif_chan(0)} AS r,
               {_gif_chan(1)} AS g,
               {_gif_chan(2)} AS b
        FROM px
    )
    SELECT media_id,
           CAST(max(w) AS INT) AS width,
           CAST(max(h) AS INT) AS height,
           CAST(sum(r) AS DOUBLE) / count(*) AS mean_r,
           CAST(sum(g) AS DOUBLE) / count(*) AS mean_g,
           CAST(sum(b) AS DOUBLE) / count(*) AS mean_b,
           CAST(min(r + 2 * g + 3 * b) AS INT) AS min_lum,
           CAST(max(r + 2 * g + 3 * b) AS INT) AS max_lum,
           CAST(sum((idx + 1) * (r + 2 * g + 3 * b)) AS BIGINT) AS poschk
    FROM chan GROUP BY media_id
    """,
    tags=("X-multimodal-pixels", "X-codec-gif"),
)
def multimodal_gif_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF pixel decode end to end: LCG palette/index formulas ->
    ``encode_gif`` (pure-Python LZW, sub-blocks, palette) -> binary
    column -> Arrow batch -> ``decode_gif_pixels`` -> channel stats.
    GIF is lossless, so the oracle recomputes every statistic from the
    formulas without touching bytes; the position-weighted ``poschk``
    makes pixel-order bugs (a mis-packed LZW code, a palette swap)
    hash-fatal. Pure map, zero exchanges."""
    from ..operators.multimodal import gif_channel_stats

    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id"))
    return gif_channel_stats(synthesize_gif_media(docs))


# ---------------------------------------------------------------------------
# TIFF pixel stats — lossless LZW+predictor round trip
# ---------------------------------------------------------------------------

_TIFF_W_MOD, _TIFF_H_MOD = 8, 6


def _tiff_chan(c: int) -> str:
    return (
        f"((((media_id % 99991) * 4093 + idx * 257 + {c} * 61 + 5)"
        f" % 65536) * 25173 + 13849) % 65536 % 256"
    )


def synthesize_tiff_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload): one REAL TIFF per document — full-range LCG
    RGB through ``encode_tiff`` with LZW compression AND the
    horizontal-differencing predictor (tag 317), the dominant
    real-world lossless TIFF shape. Arrow-batched, no shuffle."""
    import numpy as np

    from ..operators.codecs import encode_tiff

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                w = mid % _TIFF_W_MOD + 1
                h = mid % _TIFF_H_MOD + 1
                idx = np.arange(h * w, dtype=np.int64)
                px = np.stack(
                    [
                        ((((mid % 99991) * 4093 + idx * 257 + c * 61 + 5) % 65536)
                         * 25173 + 13849) % 65536 % 256
                        for c in (0, 1, 2)
                    ],
                    axis=1,
                ).astype(np.uint8).reshape(h, w, 3)
                payloads.append(encode_tiff(px, lzw=True, predictor=True))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, _MEDIA_SCHEMA)


@register(
    "multimodal_tiff_pixel_stats",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(doc_id % {_TIFF_W_MOD} + 1 AS BIGINT) AS w,
               CAST(doc_id % {_TIFF_H_MOD} + 1 AS BIGINT) AS h
        FROM documents
    ),
    px AS (
        SELECT media_id, w, h,
               unnest(generate_series(0, w * h - 1)) AS idx
        FROM dims
    ),
    chan AS (
        SELECT media_id, w, h, idx,
               {_tiff_chan(0)} AS r,
               {_tiff_chan(1)} AS g,
               {_tiff_chan(2)} AS b
        FROM px
    )
    SELECT media_id,
           CAST(max(w) AS INT) AS width,
           CAST(max(h) AS INT) AS height,
           CAST(sum(r) AS DOUBLE) / count(*) AS mean_r,
           CAST(sum(g) AS DOUBLE) / count(*) AS mean_g,
           CAST(sum(b) AS DOUBLE) / count(*) AS mean_b,
           CAST(min(r + 2 * g + 3 * b) AS INT) AS min_lum,
           CAST(max(r + 2 * g + 3 * b) AS INT) AS max_lum,
           CAST(sum((idx + 1) * (r + 2 * g + 3 * b)) AS BIGINT) AS poschk
    FROM chan GROUP BY media_id
    """,
    tags=("X-multimodal-pixels", "X-codec-tiff"),
)
def multimodal_tiff_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF pixel decode end to end: the stats stage only ever
    sees complete LZW-compressed predictor-differenced TIFFs; matching
    hashes prove the early-change LZW variant, the cumulative-sum
    predictor inversion, and strip assembly all invert the writer
    exactly through the distributed path. Pure map, zero exchanges."""
    from ..operators.multimodal import tiff_channel_stats

    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id"))
    return tiff_channel_stats(synthesize_tiff_media(docs))


# ---------------------------------------------------------------------------
# FLAC audio stats — lossless subframe-grammar round trip
# ---------------------------------------------------------------------------

_FLAC_N_MOD, _FLAC_N_BASE, _FLAC_RATE_MOD = 60, 30, 3
_FLAC_BLOCK = 32  # multiple frames per clip (spec minimum is 16)
_FLAC_S = "((media_id % 99991) * 5197 + idx * 389 + 23) % 65536 - 32768"


def synthesize_flac_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload): one REAL FLAC stream per document — LCG
    int16 samples through ``encode_flac`` at block size 32 so every
    clip spans MULTIPLE frames (frame headers, CRCs, inter-frame
    sample-number coding all on the wire). Arrow-batched, no shuffle."""
    import numpy as np

    from ..operators.codecs import encode_flac

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                n = mid % _FLAC_N_MOD + _FLAC_N_BASE
                rate = 8000 * (mid % _FLAC_RATE_MOD + 1)
                idx = np.arange(n, dtype=np.int64)
                s = ((mid % 99991) * 5197 + idx * 389 + 23) % 65536 - 32768
                payloads.append(
                    encode_flac(s.astype(np.int16), rate, block_size=_FLAC_BLOCK)
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, _MEDIA_SCHEMA)


@register(
    "multimodal_flac_audio_stats",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(doc_id % {_FLAC_N_MOD} + {_FLAC_N_BASE} AS BIGINT) AS n,
               CAST(8000 * (doc_id % {_FLAC_RATE_MOD} + 1) AS BIGINT) AS rate
        FROM documents
    ),
    samp AS (
        SELECT media_id, n, rate,
               unnest(generate_series(0, n - 1)) AS idx
        FROM dims
    ),
    vals AS (
        SELECT media_id, n, rate, idx,
               {_FLAC_S} AS s,
               CASE WHEN idx > 0 THEN
                   ((media_id % 99991) * 5197 + (idx - 1) * 389 + 23) % 65536
                       - 32768
               END AS sp
        FROM samp
    )
    SELECT media_id,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(max(rate) AS INT) AS sample_rate,
           CAST(max(n) * 1000 // max(rate) AS BIGINT) AS duration_ms,
           CAST(sum(s) AS DOUBLE) / count(*) AS mean_amp,
           CAST(min(s) AS INT) AS min_amp,
           CAST(max(s) AS INT) AS max_amp,
           CAST(sum(CASE WHEN sp IS NOT NULL AND ((sp < 0) <> (s < 0))
                    THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
           CAST(sum((idx + 1) * s) AS BIGINT) AS poschk
    FROM vals GROUP BY media_id
    """,
    tags=("X-multimodal-audio", "X-codec-flac"),
)
def multimodal_flac_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC decode end to end: LCG samples -> ``encode_flac``
    (FIXED predictors, rice residuals, CRC-8/16) -> binary column ->
    Arrow batch -> ``decode_audio_samples`` (format-sniffing dispatch
    lands on the full FLAC subframe-grammar reader) -> audio stats.
    FLAC is lossless, so the oracle recomputes from the sample formula;
    the sign-sensitive ``poschk``/``zero_cross`` make residual or
    sample-order bugs hash-fatal. Pure map, zero exchanges."""
    from ..operators.multimodal import wav_audio_stats

    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id"))
    return wav_audio_stats(synthesize_flac_media(docs))


# ---------------------------------------------------------------------------
# FLAC-fed fixed-point FFT — lossless compressed input to the verified
# spectral pipeline (oracle formula unchanged by construction)
# ---------------------------------------------------------------------------

_FLACFFT_S = "((media_id % 99991) * 7321 + idx * 269 + 17) % 65536 - 32768"


def _flac_fft_oracle() -> str:
    br = _duck_list_sql(_FFT_BITREV)
    stages = "".join(
        "," + _duck_stage_cte(t, f"x{t - 1}", f"x{t}")
        for t in range(1, _FFT_BITS + 1)
    )
    return f"""
    WITH samp AS (
        SELECT doc_id AS media_id,
               list_transform(generate_series(0, {_FFT_N - 1}), idx ->
                   CAST(((doc_id % 99991) * 7321 + idx * 269 + 17) % 65536
                        - 32768 AS BIGINT)) AS s
        FROM documents
    ),
    x0 AS (
        SELECT media_id, list_transform(generate_series(0, {_FFT_N - 1}), i ->
                   struct_pack(re := s[({br})[i+1] + 1],
                               im := CAST(0 AS BIGINT))) AS x
        FROM samp
    ){stages},
    bins AS (
        SELECT media_id, k,
               x[CAST(k + 1 AS INT)].re * x[CAST(k + 1 AS INT)].re
               + x[CAST(k + 1 AS INT)].im * x[CAST(k + 1 AS INT)].im AS p
        FROM x{_FFT_BITS}, unnest(generate_series(1, {_FFT_N // 2})) tk(k)
    ),
    wm AS (SELECT *, max(p) OVER (PARTITION BY media_id) AS maxp FROM bins)
    SELECT media_id,
           CAST({_FFT_N // 2} AS INT) AS n_bins,
           CAST(min(CASE WHEN p = maxp THEN k END) AS INT) AS dominant_bin,
           CAST(max(p) AS BIGINT) AS dominant_power,
           CAST(sum(CASE WHEN k <= {_FFT_N // 8} THEN p ELSE 0 END) AS BIGINT)
               AS low_band_power,
           CAST(sum(p) AS BIGINT) AS total_power
    FROM wm GROUP BY media_id
    """


@register(
    "multimodal_flac_fft_power",
    _flac_fft_oracle(),
    tags=("X-multimodal-dsp", "X-fft", "X-codec-flac"),
)
def multimodal_flac_fft_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verified fixed-point FFT pipeline over FLAC-COMPRESSED
    input: because FLAC is lossless, the oracle formula is unchanged —
    a matching hash proves the rice/fixed-predictor decode chain feeds
    the spectral path bit-exactly. Same zero-exchange pure-map shape as
    ``multimodal_fft_spectral_power``, and the same r13 batch-FFT form
    (guide §4.2): the butterflies run vectorized in numpy inside the
    decode's own Arrow boundary instead of six interpreted-HOF
    projections — exact int64 ops, values bit-identical."""
    import numpy as np

    from ..operators.codecs import encode_flac
    from ..operators.multimodal import decode_audio_samples

    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            decoded_rows = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                idx = np.arange(_FFT_N, dtype=np.int64)
                s = ((mid % 99991) * 7321 + idx * 269 + 17) % 65536 - 32768
                payload = encode_flac(
                    s.astype(np.int16), 8000, block_size=_FLAC_BLOCK
                )
                decoded, _rate, _nch = decode_audio_samples(payload)
                decoded_rows.append(np.asarray(decoded, dtype=np.int64))
            yield fft_feature_frame(
                pdf["doc_id"].to_numpy(), np.stack(decoded_rows)
            )

    return docs.select("doc_id").mapInPandas(run, FFT_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# G.711 mu-law audio stats — lossy but deterministic: the oracle
# recomputes the companding round trip as pure integer segment
# arithmetic in SQL (ITU-T G.711 table)
# ---------------------------------------------------------------------------

_G711_N_MOD, _G711_N_BASE = 40, 25
_G711_S = "((media_id % 99991) * 3011 + idx * 157 + 9) % 65536 - 32768"

# seg = index of the first G.711 segment end >= mag (count strictly
# below), matching np.searchsorted(side='left') in ulaw_encode
_G711_SEG_SQL = """CASE WHEN mag <= 255 THEN 0 WHEN mag <= 511 THEN 1
               WHEN mag <= 1023 THEN 2 WHEN mag <= 2047 THEN 3
               WHEN mag <= 4095 THEN 4 WHEN mag <= 8191 THEN 5
               WHEN mag <= 16383 THEN 6 ELSE 7 END"""


def synthesize_g711_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload): one REAL G.711 mu-law WAV (format tag 7)
    per document through ``encode_wav_compressed``. Arrow-batched, no
    shuffle."""
    import numpy as np

    from ..operators.codecs import encode_wav_compressed

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                n = mid % _G711_N_MOD + _G711_N_BASE
                idx = np.arange(n, dtype=np.int64)
                s = ((mid % 99991) * 3011 + idx * 157 + 9) % 65536 - 32768
                payloads.append(
                    encode_wav_compressed(s.astype(np.int16), 8000, codec="ulaw")
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, _MEDIA_SCHEMA)


@register(
    "multimodal_g711_audio_stats",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(doc_id % {_G711_N_MOD} + {_G711_N_BASE} AS BIGINT) AS n
        FROM documents
    ),
    samp AS (
        SELECT media_id, n, unnest(generate_series(0, n - 1)) AS idx
        FROM dims
    ),
    src AS (
        SELECT media_id, n, idx, {_G711_S} AS s FROM samp
    ),
    -- mu-law ENCODE (ITU-T G.711): bias, clamp, segment, 4-bit mantissa
    mseg AS (
        SELECT media_id, n, idx, s, mag,
               {_G711_SEG_SQL} AS seg
        FROM (
            SELECT *, LEAST(CASE WHEN s < 0 THEN 132 - s ELSE s + 132 END,
                            32767) AS mag
            FROM src
        )
    ),
    -- mu-law DECODE (exact table inverse): the mantissa/segment pair
    -- reconstructs the quantized magnitude; sign from the source
    dec AS (
        SELECT media_id, n, idx, s,
               CASE WHEN s < 0 THEN 132 - t ELSE t - 132 END AS d
        FROM (
            SELECT *,
                   (((mag >> (seg + 3)) & 15) * 8 + 132)
                       * (CAST(1 AS BIGINT) << seg) AS t
            FROM mseg
        )
    ),
    vals AS (
        SELECT media_id, n, idx, d,
               lag(d) OVER (PARTITION BY media_id ORDER BY idx) AS dp
        FROM dec
    )
    SELECT media_id,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(8000 AS INT) AS sample_rate,
           CAST(max(n) * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST(sum(d) AS DOUBLE) / count(*) AS mean_amp,
           CAST(min(d) AS INT) AS min_amp,
           CAST(max(d) AS INT) AS max_amp,
           CAST(sum(CASE WHEN dp IS NOT NULL AND ((dp < 0) <> (d < 0))
                    THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
           CAST(sum((idx + 1) * d) AS BIGINT) AS poschk
    FROM vals GROUP BY media_id
    """,
    tags=("X-multimodal-audio", "X-codec-g711"),
)
def multimodal_g711_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL G.711 mu-law round trip end to end: LCG int16 ->
    ``encode_wav_compressed`` (format-tag-7 WAV, vectorized companding)
    -> Arrow batch -> ``decode_audio_samples`` -> audio stats. G.711 is
    lossy, but the companding table is PURE INTEGER segment arithmetic,
    so the oracle recomputes the full encode->decode round trip in SQL
    and every statistic of the DECODED samples is formula-exact. Pure
    map, zero exchanges."""
    from ..operators.multimodal import wav_audio_stats

    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id"))
    return wav_audio_stats(synthesize_g711_media(docs))


# ---------------------------------------------------------------------------
# Sun-AU audio stats — 16-bit big-endian PCM (lossless container path)
# ---------------------------------------------------------------------------

_AU_N_MOD, _AU_N_BASE, _AU_RATE_MOD = 45, 20, 2
_AU_S = "((media_id % 99991) * 6311 + idx * 211 + 13) % 65536 - 32768"


def synthesize_au_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload): one REAL Sun-AU (.au) file per document —
    16-bit BIG-ENDIAN PCM (encoding 3), the byte order the WAV path
    never exercises. Arrow-batched, no shuffle."""
    import numpy as np

    from ..operators.codecs import encode_au

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                n = mid % _AU_N_MOD + _AU_N_BASE
                rate = 8000 * (mid % _AU_RATE_MOD + 1)
                idx = np.arange(n, dtype=np.int64)
                s = ((mid % 99991) * 6311 + idx * 211 + 13) % 65536 - 32768
                payloads.append(encode_au(s.astype(np.int16), rate, encoding=3))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, _MEDIA_SCHEMA)


@register(
    "multimodal_au_audio_stats",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(doc_id % {_AU_N_MOD} + {_AU_N_BASE} AS BIGINT) AS n,
               CAST(8000 * (doc_id % {_AU_RATE_MOD} + 1) AS BIGINT) AS rate
        FROM documents
    ),
    samp AS (
        SELECT media_id, n, rate,
               unnest(generate_series(0, n - 1)) AS idx
        FROM dims
    ),
    vals AS (
        SELECT media_id, n, rate, idx,
               {_AU_S} AS s,
               CASE WHEN idx > 0 THEN
                   ((media_id % 99991) * 6311 + (idx - 1) * 211 + 13) % 65536
                       - 32768
               END AS sp
        FROM samp
    )
    SELECT media_id,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(max(rate) AS INT) AS sample_rate,
           CAST(max(n) * 1000 // max(rate) AS BIGINT) AS duration_ms,
           CAST(sum(s) AS DOUBLE) / count(*) AS mean_amp,
           CAST(min(s) AS INT) AS min_amp,
           CAST(max(s) AS INT) AS max_amp,
           CAST(sum(CASE WHEN sp IS NOT NULL AND ((sp < 0) <> (s < 0))
                    THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
           CAST(sum((idx + 1) * s) AS BIGINT) AS poschk
    FROM vals GROUP BY media_id
    """,
    tags=("X-multimodal-audio", "X-codec-au"),
)
def multimodal_au_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Sun-AU decode end to end: the big-endian 24-byte header +
    raw 16-bit BE PCM payload is the classic Unix/Java telephony
    container; lossless, so the oracle recomputes from the formula. The
    sign-sensitive ``poschk`` makes an endianness slip (the whole point
    of the BE path) hash-fatal. Pure map, zero exchanges (no fan_out:
    PCM decode is trivial per row — the round-robin exchange measured
    net-negative, 0.59 -> 0.66 s at sf0.1)."""
    from ..operators.multimodal import wav_audio_stats

    docs = table(spark, sf_dir, "documents")
    return wav_audio_stats(synthesize_au_media(docs))


# ---------------------------------------------------------------------------
# MJPEG/AVI frame track — structural surface (frame grid, stride,
# timestamps, dims) is formula-exact even though JPEG pixels are lossy
# ---------------------------------------------------------------------------

_VID_NF_MOD, _VID_NF_BASE = 4, 2
_VID_FPS_MOD = 3
_VID_W_MOD, _VID_W_BASE = 6, 8
_VID_H_MOD, _VID_H_BASE = 4, 6
_VID_EVERY_MS = 400


def synthesize_avi_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload): one REAL MJPEG AVI clip per document —
    n = id%4+2 baseline-JPEG frames at fps = 5*(id%3+1) through
    ``encode_avi_mjpeg`` (RIFF/hdrl/movi/idx1). Frame pixels are LCG
    (deterministic across task retries); only the structural surface is
    hashed downstream. Arrow-batched, no shuffle."""
    import numpy as np

    from ..operators.codecs import encode_avi_mjpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                nf = mid % _VID_NF_MOD + _VID_NF_BASE
                fps = 5 * (mid % _VID_FPS_MOD + 1)
                w = mid % _VID_W_MOD + _VID_W_BASE
                h = mid % _VID_H_MOD + _VID_H_BASE
                yy, xx = np.mgrid[0:h, 0:w]
                frames = [
                    np.stack(
                        [
                            (mid * 31 + t * 17 + (yy * w + xx) * 7 + c * 3) % 256
                            for c in (0, 1, 2)
                        ],
                        axis=2,
                    ).astype(np.uint8)
                    for t in range(nf)
                ]
                payloads.append(encode_avi_mjpeg(frames, fps=fps))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, _MEDIA_SCHEMA)


@register(
    "multimodal_video_frame_track",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(doc_id % {_VID_NF_MOD} + {_VID_NF_BASE} AS BIGINT) AS nf,
               CAST(5 * (doc_id % {_VID_FPS_MOD} + 1) AS BIGINT) AS fps,
               CAST(doc_id % {_VID_W_MOD} + {_VID_W_BASE} AS BIGINT) AS w,
               CAST(doc_id % {_VID_H_MOD} + {_VID_H_BASE} AS BIGINT) AS h
        FROM documents
    ),
    sampled AS (
        SELECT media_id, fps, w, h,
               unnest(generate_series(0, nf - 1)) AS fi,
               GREATEST(1, fps * {_VID_EVERY_MS} // 1000) AS step
        FROM dims
    )
    SELECT media_id,
           CAST(fi AS INT) AS frame_idx,
           CAST(fi * 1000 // fps AS BIGINT) AS frame_ts_ms,
           CAST(fps AS INT) AS fps,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height
    FROM sampled WHERE fi % step = 0
    """,
    tags=("X-multimodal-video", "X-codec-avi"),
)
def multimodal_video_frame_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling end to end: synthesized MJPEG AVIs ->
    Arrow batch -> ``index_avi`` RIFF walk -> stride sampling at
    every_ms=400 -> per-sampled-frame JPEG decode -> structural track
    (frame index, timestamp, fps, dims). JPEG is lossy so pixel values
    stay off the hashed surface (COVERAGE.md staging note); the oracle
    pins the structure arithmetically — every container-walk, stride,
    fps or dimension bug is hash-fatal, and a frame that fails to
    decode DROPS its row (rows_match catches it). Pure map."""
    from ..operators.multimodal import video_frame_stats

    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id"))
    stats = video_frame_stats(synthesize_avi_media(docs), every_ms=_VID_EVERY_MS)
    return stats.select(
        "media_id", "frame_idx", "frame_ts_ms", "fps", "width", "height"
    )


# ---------------------------------------------------------------------------
# VAD-style frame-energy gating over the STFT track (VERDICT r12 item
# 8): amplitude-modulated clips -> Hann+FFT frame energies -> gate
# frames above the clip mean -> segment consecutive active frames
# ---------------------------------------------------------------------------

# amplitude modulation: every other 64-sample block is attenuated by an
# arithmetic >> 5 (floor shift, identical on both engines), so frames
# alternate loud / mixed / quiet and the gate has real structure to find
_VAD_BASE = "((media_id % 99991) * 6577 + idx * 97 + 29) % 65536 - 32768"


def _vad_oracle() -> str:
    br = _duck_list_sql(_FFT_BITREV)
    hann = _duck_list_sql(_STFT_HANN)
    keys = "media_id, frame"
    stages = "".join(
        "," + _duck_stage_cte(t, f"x{t - 1}", f"x{t}", keys=keys)
        for t in range(1, _FFT_BITS + 1)
    )
    return f"""
    WITH samp AS (
        SELECT doc_id AS media_id,
               list_transform(generate_series(0, {_STFT_CLIP - 1}), idx ->
                   CAST(CASE WHEN (idx // 64) % 2 = 1
                        THEN ({_VAD_BASE.replace("media_id", "doc_id")}) >> 5
                        ELSE {_VAD_BASE.replace("media_id", "doc_id")}
                        END AS BIGINT)) AS s
        FROM documents
    ),
    frames AS (
        SELECT media_id, CAST(f AS BIGINT) AS frame,
               s[f * {_STFT_HOP} + 1 : f * {_STFT_HOP} + {_FFT_N}] AS fs
        FROM samp, unnest(generate_series(0, {_STFT_FRAMES - 1})) tf(f)
    ),
    x0 AS (
        SELECT media_id, frame,
               list_transform(generate_series(0, {_FFT_N - 1}), i ->
                   struct_pack(
                       re := (fs[({br})[i+1] + 1]
                              * ({hann})[({br})[i+1] + 1]) >> {_FFT_SCALE_BITS},
                       im := CAST(0 AS BIGINT))) AS x
        FROM frames
    ){stages},
    fpow AS (
        SELECT media_id, frame,
               sum(x[CAST(k + 1 AS INT)].re * x[CAST(k + 1 AS INT)].re
                   + x[CAST(k + 1 AS INT)].im * x[CAST(k + 1 AS INT)].im)
                   AS fp
        FROM x{_FFT_BITS}, unnest(generate_series(1, {_FFT_N // 2})) tk(k)
        GROUP BY media_id, frame
    ),
    gate AS (
        SELECT media_id, frame, fp,
               sum(fp) OVER (PARTITION BY media_id) AS tp
        FROM fpow
    ),
    act AS (
        SELECT media_id, frame, fp FROM gate
        WHERE fp * {_STFT_FRAMES} > tp
    ),
    runs AS (
        SELECT media_id, frame, fp,
               frame - row_number()
                   OVER (PARTITION BY media_id ORDER BY frame) AS grp
        FROM act
    )
    SELECT media_id,
           CAST(min(frame) AS INT) AS seg_start,
           CAST(max(frame) AS INT) AS seg_end,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(fp) AS BIGINT) AS seg_power
    FROM runs GROUP BY media_id, grp
    """


@register(
    "multimodal_vad_speech_segments",
    _vad_oracle(),
    tags=("X-multimodal-dsp", "X-fft", "X-vad"),
)
def multimodal_vad_speech_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-style gating over the verified STFT frame track:
    amplitude-modulated clips (alternate 64-sample blocks attenuated
    >> 5) -> Hann-windowed fixed-point FFT per 50%-overlap frame ->
    frame energy -> gate frames whose energy exceeds the clip mean
    (exact integer comparison fp * 7 > sum(fp)) -> group consecutive
    active frames into segments (the classic frame - row_number() run
    trick). Emits per segment: start/end frame, length, total energy —
    all exact BIGINTs, cross-engine bit-exact under the r12 determinism
    contract.

    Plan (r13, guide §4.2/§2.4): every frame of a clip lives in the
    clip's own source row, so the gate and run-grouping are per-clip
    LOCAL — the query is now ONE Arrow-batched map (codec round trip +
    batch FFT + frame gating + run segmentation, all vectorized numpy)
    with ZERO exchanges; the former two media_id window exchanges only
    re-grouped rows that were already co-resident. Values unchanged
    (exact int64 throughout, preflight-exact)."""
    import numpy as np

    from ..operators.multimodal import decode_wav_samples, encode_wav

    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id"))
    hann = None  # built lazily executor-side
    gather = None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nonlocal hann, gather
        if hann is None:
            hann = np.asarray(_STFT_HANN, dtype=np.int64)
            gather = (
                np.arange(_STFT_FRAMES, dtype=np.intp)[:, None] * _STFT_HOP
                + np.arange(_FFT_N, dtype=np.intp)[None, :]
            )
        for pdf in batches:
            if not len(pdf):
                continue
            decoded_rows = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                idx = np.arange(_STFT_CLIP, dtype=np.int64)
                base = ((mid % 99991) * 6577 + idx * 97 + 29) % 65536 - 32768
                s = np.where((idx >> 6) % 2 == 1, base >> 5, base)
                payload = encode_wav(s.astype(np.int16), 8000)
                decoded, _rate, _nch = decode_wav_samples(payload)
                decoded_rows.append(np.asarray(decoded, dtype=np.int64))
            m = len(decoded_rows)
            clips = np.stack(decoded_rows)  # (m, 256)
            windowed = ((clips[:, gather] * hann) >> _FFT_SCALE_BITS).reshape(
                m * _STFT_FRAMES, _FFT_N
            )
            fp = fft_power_bins(windowed).sum(axis=1).reshape(m, _STFT_FRAMES)
            active = fp * _STFT_FRAMES > fp.sum(axis=1, keepdims=True)
            mids, starts, ends, counts, powers = [], [], [], [], []
            doc_ids = pdf["doc_id"].to_numpy(np.int64)
            for r in range(m):
                f = 0
                row_active = active[r]
                while f < _STFT_FRAMES:
                    if not row_active[f]:
                        f += 1
                        continue
                    start = f
                    while f < _STFT_FRAMES and row_active[f]:
                        f += 1
                    mids.append(doc_ids[r])
                    starts.append(start)
                    ends.append(f - 1)
                    counts.append(f - start)
                    powers.append(int(fp[r, start:f].sum()))
            yield pd.DataFrame(
                {
                    "media_id": np.asarray(mids, dtype=np.int64),
                    "seg_start": np.asarray(starts, dtype=np.int32),
                    "seg_end": np.asarray(ends, dtype=np.int32),
                    "n_frames": np.asarray(counts, dtype=np.int64),
                    "seg_power": np.asarray(powers, dtype=np.int64),
                }
            )

    return docs.select("doc_id").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("seg_start", T.IntegerType()),
                T.StructField("seg_end", T.IntegerType()),
                T.StructField("n_frames", T.LongType()),
                T.StructField("seg_power", T.LongType()),
            ]
        ),
    )
