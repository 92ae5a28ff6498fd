"""Round-12 batch: the O(n log n) FFT spectral form (VERDICT r10/r11
stretch item, deferred until the libm story closed — it closed in r12).

``multimodal_fft_spectral_power`` is the scale-path sibling of the
O(n^2) DFT demo (multimodal_wav_spectral_features): a radix-2 iterative
Cooley-Tukey FFT over real decoded PCM samples, run entirely in SQL as
six unrolled butterfly stages over a per-document array column. Where
the DFT fans out n/2 x n term rows per clip, the FFT does 6 x 64
constant-time butterflies per document with ZERO exchanges after the
decode — at 100 TB each document is one row of embarrassingly parallel
work, and the crossover vs the DFT grows with clip length (n=64 here:
384 butterfly ops vs 2,048 product terms).

Determinism (the r12 contract, SCALE.md): the twiddle factors are
BUILD-TIME LITERAL DATA — cos/sin(-2*pi*p/2^t) quantized to BINARY
fixed point (2^20) in Python once and inlined into both the Spark
expressions and the oracle SQL, so no engine libm call exists anywhere.
Complex products rescale with an ARITHMETIC RIGHT SHIFT (>> 20), which
both engines define as floor division by 2^20 for negative BIGINTs
(verified on Spark 4.1 shiftright and DuckDB 1.0 >>) — every
intermediate is an exact integer with the identical value on both
engines, so the output power spectrum is bit-exact by construction.
Magnitude bound: |x| grows by at most (1 + |c|+|s| scaled) ~ 2.42x per
stage, so |re|,|im| <= 32768 * 2.42^6 ~ 6.6e6, products <= 7e12 and
bin powers <= 9e13 — comfortable int64 with the bound pinned in
tests/test_round12_ops.py.

Reference codec lineage: the samples travel the REAL encode_wav ->
decode_wav_samples byte round trip (operators/multimodal.py, the
round-9/10 codec pattern); the oracle recomputes from the generating
LCG formula and never touches bytes, so a matching hash proves the
codec chain AND the fixed-point FFT together.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import register, table

_FFT_BITS = 6
_FFT_N = 1 << _FFT_BITS  # 64 samples per clip
_FFT_SCALE_BITS = 20  # binary fixed point: rescale is an exact >> on both engines
_FFT_RATE = 8000


def _qfix(x: float) -> int:
    """Half-away-from-zero quantization to 2^20 binary fixed point —
    build-time only; the engines never evaluate cos/sin."""
    s = 1 << _FFT_SCALE_BITS
    return int(math.floor(x * s + 0.5)) if x >= 0 else -int(math.floor(-x * s + 0.5))


def _bitrev(i: int) -> int:
    return int(format(i, f"0{_FFT_BITS}b")[::-1], 2)


_FFT_BITREV = [_bitrev(i) for i in range(_FFT_N)]
# per stage t = 1..6: half = 2^(t-1) twiddles W_{2^t}^p = e^{-2*pi*i*p/2^t}
_FFT_TWIDDLES = [
    (
        [_qfix(math.cos(-2.0 * math.pi * p / (1 << t))) for p in range(1 << (t - 1))],
        [_qfix(math.sin(-2.0 * math.pi * p / (1 << t))) for p in range(1 << (t - 1))],
    )
    for t in range(1, _FFT_BITS + 1)
]


def fft_fixed_point(samples: list[int]) -> list[tuple[int, int]]:
    """Pure-Python reference of the EXACT integer FFT both engines run —
    the parity anchor for tests (and the consumer-side documentation of
    the arithmetic: floor-shift rescale after every complex product)."""
    x = [(samples[_FFT_BITREV[i]], 0) for i in range(_FFT_N)]
    for t in range(1, _FFT_BITS + 1):
        span, half = 1 << t, 1 << (t - 1)
        twc, tws = _FFT_TWIDDLES[t - 1]
        nxt = [None] * _FFT_N
        for i in range(_FFT_N):
            pos = i % span
            if pos < half:
                a, b = x[i], x[i + half]
                pr = (b[0] * twc[pos] - b[1] * tws[pos]) >> _FFT_SCALE_BITS
                pi = (b[0] * tws[pos] + b[1] * twc[pos]) >> _FFT_SCALE_BITS
                nxt[i] = (a[0] + pr, a[1] + pi)
            else:
                p = pos - half
                a, b = x[i - half], x[i]
                pr = (b[0] * twc[p] - b[1] * tws[p]) >> _FFT_SCALE_BITS
                pi = (b[0] * tws[p] + b[1] * twc[p]) >> _FFT_SCALE_BITS
                nxt[i] = (a[0] - pr, a[1] - pi)
        x = nxt
    return x


_SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("s", T.ArrayType(T.LongType())),
    ]
)


def _wav_sample_arrays(docs: DataFrame, n: int) -> DataFrame:
    """(media_id, s[n]): synthesize a REAL n-sample WAV per document
    (same LCG family as the variable-length corpus) and decode it back
    through the byte-level reader — one Arrow-batched round trip, no
    shuffle, samples emitted as one array row per clip (the FFT/STFT
    unit of work)."""
    import numpy as np

    from ..operators.multimodal import decode_wav_samples, encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                idx = np.arange(n, dtype=np.int64)
                s = ((mid % 99991) * 6007 + idx * 193 + 11) % 65536 - 32768
                payload = encode_wav(s.astype(np.int16), _FFT_RATE)
                decoded, _rate, _nch = decode_wav_samples(payload)
                out.append([int(v) for v in decoded])
            yield pd.DataFrame({"media_id": pdf["doc_id"], "s": out})

    return docs.select("doc_id").mapInPandas(run, _SAMPLES_SCHEMA)


def _wav64_sample_arrays(docs: DataFrame) -> DataFrame:
    return _wav_sample_arrays(docs, _FFT_N)


def _long_array_sql(vals: list[int]) -> str:
    return "array(" + ",".join(f"{v}L" for v in vals) + ")"


def _spark_stage_expr(t: int) -> str:
    span, half = 1 << t, 1 << (t - 1)
    twc, tws = _FFT_TWIDDLES[t - 1]
    c, s = _long_array_sql(twc), _long_array_sql(tws)
    sh = _FFT_SCALE_BITS
    return (
        f"transform(sequence(0, {_FFT_N - 1}), i -> "
        f"CASE WHEN (i % {span}) < {half} THEN named_struct("
        f"'re', element_at(x, i+1).re + shiftright("
        f"element_at(x, i+{half}+1).re * element_at({c}, (i % {span})+1)"
        f" - element_at(x, i+{half}+1).im * element_at({s}, (i % {span})+1), {sh}),"
        f"'im', element_at(x, i+1).im + shiftright("
        f"element_at(x, i+{half}+1).re * element_at({s}, (i % {span})+1)"
        f" + element_at(x, i+{half}+1).im * element_at({c}, (i % {span})+1), {sh}))"
        f" ELSE named_struct("
        f"'re', element_at(x, i-{half}+1).re - shiftright("
        f"element_at(x, i+1).re * element_at({c}, (i % {span})-{half}+1)"
        f" - element_at(x, i+1).im * element_at({s}, (i % {span})-{half}+1), {sh}),"
        f"'im', element_at(x, i-{half}+1).im - shiftright("
        f"element_at(x, i+1).re * element_at({s}, (i % {span})-{half}+1)"
        f" + element_at(x, i+1).im * element_at({c}, (i % {span})-{half}+1), {sh}))"
        f" END)"
    )


def _duck_list_sql(vals: list[int]) -> str:
    return "[" + ",".join(f"CAST({v} AS BIGINT)" for v in vals) + "]"


def _duck_stage_cte(t: int, prev: str, cur: str, keys: str = "media_id") -> str:
    span, half = 1 << t, 1 << (t - 1)
    twc, tws = _FFT_TWIDDLES[t - 1]
    c, s = _duck_list_sql(twc), _duck_list_sql(tws)
    sh = _FFT_SCALE_BITS
    return f"""
    {cur} AS (
        SELECT {keys}, list_transform(generate_series(0, {_FFT_N - 1}), i ->
            CASE WHEN (i % {span}) < {half} THEN struct_pack(
                re := x[i+1].re + ((x[i+{half}+1].re * ({c})[(i % {span})+1]
                      - x[i+{half}+1].im * ({s})[(i % {span})+1]) >> {sh}),
                im := x[i+1].im + ((x[i+{half}+1].re * ({s})[(i % {span})+1]
                      + x[i+{half}+1].im * ({c})[(i % {span})+1]) >> {sh}))
            ELSE struct_pack(
                re := x[i-{half}+1].re - ((x[i+1].re * ({c})[(i % {span})-{half}+1]
                      - x[i+1].im * ({s})[(i % {span})-{half}+1]) >> {sh}),
                im := x[i-{half}+1].im - ((x[i+1].re * ({s})[(i % {span})-{half}+1]
                      + x[i+1].im * ({c})[(i % {span})-{half}+1]) >> {sh}))
            END) AS x
        FROM {prev}
    )"""


def _fft_oracle() -> str:
    br = _duck_list_sql(_FFT_BITREV)
    stages = "".join(
        "," + _duck_stage_cte(t, f"x{t - 1}", f"x{t}") for t in range(1, _FFT_BITS + 1)
    )
    return f"""
    WITH samp AS (
        SELECT doc_id AS media_id,
               list_transform(generate_series(0, {_FFT_N - 1}), idx ->
                   CAST(((doc_id % 99991) * 6007 + idx * 193 + 11) % 65536
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
    "multimodal_fft_spectral_power",
    _fft_oracle(),
    tags=("X-multimodal-dsp", "X-fft"),
)
def multimodal_fft_spectral_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radix-2 fixed-point FFT power spectrum over real decoded PCM —
    the O(n log n) production form of the DFT demo (module docstring:
    scale shape, literal twiddles, exact-integer determinism contract).
    Emits per clip: dominant bin (ties to the smallest), its power, the
    low-band (k <= n/8) power, and total half-spectrum power — all
    exact BIGINTs. Plan shape: Arrow decode -> six narrow array
    projections -> one 32-element reduction per row; ZERO exchanges
    (verified in PLANS.md), so the operator is a pure map at any scale."""
    docs = table(spark, sf_dir, "documents")
    samp = _wav64_sample_arrays(docs)
    br = _long_array_sql(_FFT_BITREV)
    x = samp.select(
        "media_id",
        F.expr(
            f"transform(sequence(0, {_FFT_N - 1}), i -> named_struct("
            f"'re', element_at(s, CAST(element_at({br}, i+1) + 1 AS INT)),"
            f"'im', CAST(0 AS BIGINT)))"
        ).alias("x"),
    )
    for t in range(1, _FFT_BITS + 1):
        x = x.select("media_id", F.expr(_spark_stage_expr(t)).alias("x"))
    pows = x.select(
        "media_id",
        F.expr(
            f"transform(sequence(1, {_FFT_N // 2}), k -> named_struct("
            f"'k', k,"
            f"'p', element_at(x, k+1).re * element_at(x, k+1).re"
            f" + element_at(x, k+1).im * element_at(x, k+1).im))"
        ).alias("pows"),
    ).withColumn("maxp", F.expr("array_max(transform(pows, e -> e.p))"))
    return pows.select(
        "media_id",
        F.lit(_FFT_N // 2).cast("int").alias("n_bins"),
        F.expr("array_min(transform(filter(pows, e -> e.p = maxp), e -> e.k))")
        .cast("int")
        .alias("dominant_bin"),
        F.col("maxp").cast("long").alias("dominant_power"),
        F.expr(
            f"aggregate(pows, CAST(0 AS BIGINT),"
            f" (a, e) -> a + CASE WHEN e.k <= {_FFT_N // 8} THEN e.p ELSE CAST(0 AS BIGINT) END)"
        ).alias("low_band_power"),
        F.expr("aggregate(pows, CAST(0 AS BIGINT), (a, e) -> a + e.p)").alias(
            "total_power"
        ),
    )


# ---------------------------------------------------------------------------
# STFT spectrogram: Hann-windowed overlapping frames -> per-frame FFT
# ---------------------------------------------------------------------------

_STFT_FRAMES = 7
_STFT_HOP = 32  # 50% overlap at the 64-sample frame
_STFT_CLIP = (_STFT_FRAMES - 1) * _STFT_HOP + _FFT_N  # 256 samples

# Hann window, same build-time literal discipline as the twiddles
_STFT_HANN = [
    _qfix(0.5 * (1.0 - math.cos(2.0 * math.pi * i / (_FFT_N - 1))))
    for i in range(_FFT_N)
]


def stft_fixed_point(samples: list[int]) -> list[list[tuple[int, int]]]:
    """Python reference of the exact integer STFT: Hann-window each
    hop-32 frame (floor-shift rescale), then the shared fft_fixed_point.
    Returns per-frame complex spectra."""
    out = []
    for f in range(_STFT_FRAMES):
        fs = samples[f * _STFT_HOP : f * _STFT_HOP + _FFT_N]
        ws = [(v * _STFT_HANN[i]) >> _FFT_SCALE_BITS for i, v in enumerate(fs)]
        out.append(fft_fixed_point(ws))
    return out


def _stft_oracle() -> str:
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
                   CAST(((doc_id % 99991) * 6007 + idx * 193 + 11) % 65536
                        - 32768 AS BIGINT)) AS s
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
    bins AS (
        SELECT media_id, frame, k,
               x[CAST(k + 1 AS INT)].re * x[CAST(k + 1 AS INT)].re
               + x[CAST(k + 1 AS INT)].im * x[CAST(k + 1 AS INT)].im AS p
        FROM x{_FFT_BITS}, unnest(generate_series(1, {_FFT_N // 2})) tk(k)
    ),
    wm AS (SELECT *, max(p) OVER (PARTITION BY media_id, frame) AS maxp
           FROM bins)
    SELECT media_id, frame,
           CAST(min(CASE WHEN p = maxp THEN k END) AS INT) AS dominant_bin,
           CAST(max(p) AS BIGINT) AS dominant_power,
           CAST(sum(p) AS BIGINT) AS total_power
    FROM wm GROUP BY media_id, frame
    """


@register(
    "multimodal_stft_spectrogram",
    _stft_oracle(),
    tags=("X-multimodal-dsp", "X-fft"),
)
def multimodal_stft_spectrogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STFT spectrogram — the actual audio-pipeline primitive (frame ->
    Hann window -> FFT -> per-frame spectrum) that every audio
    feature-extraction / dataset-curation stack runs upstream of VAD,
    language-ID, or codec-quality filters. 256 decoded PCM samples per
    clip, seven 64-sample frames at 50% overlap, the Hann window and
    twiddles both build-time literal fixed point (the r12 determinism
    contract) — every value bit-exact across engines, preflight-exact.

    Emits (media_id, frame, dominant_bin, dominant_power, total_power):
    the frame-grain dominant-frequency track, i.e. the spectrogram
    ridge. Plan: Arrow decode -> narrow frame posexplode (7x, no
    shuffle) -> windowed bit-reversal projection -> six butterfly
    projections -> 32-element reduction per frame; the only exchange in
    the plan is the final noop-write — frames of one clip stay in the
    source partition, so the operator is a pure map at 100 TB exactly
    like the single-frame FFT."""
    docs = table(spark, sf_dir, "documents")
    samp = _wav_sample_arrays(docs, _STFT_CLIP)
    br = _long_array_sql(_FFT_BITREV)
    hann = _long_array_sql(_STFT_HANN)
    frames = samp.select(
        "media_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_STFT_FRAMES - 1}),"
                f" f -> slice(s, f * {_STFT_HOP} + 1, {_FFT_N}))"
            )
        ).alias("frame", "fs"),
    ).select("media_id", F.col("frame").cast("long").alias("frame"), "fs")
    x = frames.select(
        "media_id",
        "frame",
        F.expr(
            f"transform(sequence(0, {_FFT_N - 1}), i -> named_struct("
            f"'re', shiftright("
            f"element_at(fs, CAST(element_at({br}, i+1) + 1 AS INT))"
            f" * element_at({hann}, CAST(element_at({br}, i+1) + 1 AS INT)),"
            f" {_FFT_SCALE_BITS}),"
            f"'im', CAST(0 AS BIGINT)))"
        ).alias("x"),
    )
    for t in range(1, _FFT_BITS + 1):
        x = x.select("media_id", "frame", F.expr(_spark_stage_expr(t)).alias("x"))
    pows = x.select(
        "media_id",
        "frame",
        F.expr(
            f"transform(sequence(1, {_FFT_N // 2}), k -> named_struct("
            f"'k', k,"
            f"'p', element_at(x, k+1).re * element_at(x, k+1).re"
            f" + element_at(x, k+1).im * element_at(x, k+1).im))"
        ).alias("pows"),
    ).withColumn("maxp", F.expr("array_max(transform(pows, e -> e.p))"))
    return pows.select(
        "media_id",
        "frame",
        F.expr("array_min(transform(filter(pows, e -> e.p = maxp), e -> e.k))")
        .cast("int")
        .alias("dominant_bin"),
        F.col("maxp").cast("long").alias("dominant_power"),
        F.expr("aggregate(pows, CAST(0 AS BIGINT), (a, e) -> a + e.p)").alias(
            "total_power"
        ),
    )
