"""Round-10 module 4: perceptual image hashing (pHash family).
Unit tests: tests/test_image_phash.py.

``multimodal_image_phash_buckets`` is the image near-dup operator the
text-side dedup family (minhash / simhash / embedding-LSH) has no
analog for: a DCT-sign perceptual hash over REAL DECODED PIXELS — the
pHash construction used by every image-dedup pipeline (DCT the
luminance plane, keep the low-frequency coefficients' SIGNS as bits,
bucket by the packed hash; near-duplicate images land in the same
bucket even under brightness scaling, because signs survive gain).

The demo images are the round-10 PNG corpus (w x h up to 6 x 5), so
the DCT runs over the whole plane and the hash has w*h - 1 bits (DC
dropped — it only encodes brightness). At real image sizes the
standard pipeline resizes to 32x32 first (the resize operator exists
in operators/multimodal.py) and keeps the 8x8 low block; the decode ->
explode -> DCT -> sign-pack plumbing is IDENTICAL.

Cross-engine determinism (r12 contract — VERDICT r11 item 3): NO
ENGINE LIBM CALL EXISTS IN THIS QUERY. The micro-quantized DCT factors
are build-time literal data (_DCT_ROWS, generated once in Python and
injected into both the Spark plan and the oracle's VALUES — parity by
construction on any libm, the r11 heaps probe having proven
cross-build cos/ln divergence is real); every coefficient accumulates
as exact order-free integers; the sign test and the bit-pack
(1L << (v*w + u)) are pure integer ops. Nothing floats anywhere.

Scale shape: decode is Arrow-batched per row; the term fan-out is
(w*h)^2 per image — bounded by the (resized) image size, linear in
images; coefficient sums are map-side-combined; the bucket count is a
window partitioned by the hash (bounded groups). No all-pairs
comparison anywhere: near-dup candidates emerge from equal buckets,
exactly like the text LSH family."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, table
from .round10 import _PNG_H_MOD, _PNG_W_MOD, synthesize_png_media

_PI = repr(math.pi)


def _q6(x: float) -> int:
    """Build-time half-away-from-zero micro quantization (the engines'
    former round() convention — values identical to the r11 plan)."""
    return int(math.floor(x * 1e6 + 0.5)) if x >= 0 else -int(math.floor(-x * 1e6 + 0.5))


# r12 (VERDICT r11 item 3): the DCT cosine factors are BUILD-TIME
# LITERAL DATA — cos(pi*(2c+1)f/(2s)) micro-quantized once here and
# injected into both the Spark plan and the oracle's VALUES, so no
# engine libm call exists anywhere in the query (the spectral-features
# pattern, plans/round10.py). 91 rows for s <= 6; the production
# 32x32-resize variant's table is 32^2 = 1,024 rows — same shape,
# still broadcast-sized.
_DCT_SIZES = max(_PNG_W_MOD, _PNG_H_MOD)
_DCT_ROWS = [
    (s, c, f, _q6(math.cos(math.pi * (2 * c + 1) * f / (2 * s))))
    for s in range(1, _DCT_SIZES + 1)
    for c in range(s)
    for f in range(s)
]
_DCT_VALUES_SQL = ",".join(f"({s},{c},{f},{q})" for s, c, f, q in _DCT_ROWS)


def _oracle() -> str:
    return f"""
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
    vals AS (
        SELECT media_id, w, h, idx % w AS x, idx // w AS y,
               (((((media_id % 100003) * 8191 + idx * 131 + 0 * 31 + 19)
                  % 65536) * 25173 + 13849) % 65536 % 256)
               + 2 * (((((media_id % 100003) * 8191 + idx * 131 + 1 * 31
                         + 19) % 65536) * 25173 + 13849) % 65536 % 256)
               + 3 * (((((media_id % 100003) * 8191 + idx * 131 + 2 * 31
                         + 19) % 65536) * 25173 + 13849) % 65536 % 256)
                   AS lum
        FROM px
    ),
    cosf AS (
        SELECT CAST(s AS BIGINT) AS s, CAST(c AS BIGINT) AS c,
               CAST(f AS BIGINT) AS f, CAST(q AS BIGINT) AS q
        FROM (VALUES {_DCT_VALUES_SQL}) AS t(s, c, f, q)
    ),
    terms AS (
        SELECT media_id, w, h, u, v, lum * cw.q * ch.q AS t
        FROM vals,
             unnest(generate_series(0, w - 1)) uu(u),
             unnest(generate_series(0, h - 1)) vv(v),
             cosf cw, cosf ch
        WHERE cw.s = w AND cw.c = x AND cw.f = u
          AND ch.s = h AND ch.c = y AND ch.f = v
    ),
    coeff AS (
        SELECT media_id, w, h, u, v, sum(t) AS c
        FROM terms GROUP BY media_id, w, h, u, v
    ),
    ph AS (
        SELECT media_id,
               CAST(sum(CASE WHEN c > 0
                    THEN CAST(1 AS BIGINT) << CAST(v * w + u AS INTEGER)
                    ELSE 0 END) AS BIGINT) AS phash
        FROM coeff
        WHERE NOT (u = 0 AND v = 0)
        GROUP BY media_id
    ),
    at_media AS (
        SELECT d.media_id, CAST(d.w AS INT) AS width,
               CAST(d.h AS INT) AS height,
               COALESCE(p.phash, CAST(0 AS BIGINT)) AS phash
        FROM dims d LEFT JOIN ph p ON d.media_id = p.media_id
    )
    SELECT media_id, width, height, phash,
           CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS n_bucket
    FROM at_media
    """


@register("multimodal_image_phash_buckets", _oracle(), tags=("X-phash",))
def multimodal_image_phash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCT-sign perceptual hash (pHash) over real decoded PNG pixels,
    bucketed for image near-dup detection — see the module docstring
    for the construction, determinism design, and the 32x32/8x8
    production variant. The oracle recomputes everything from the pixel
    formula, so a matching hash proves decode + DCT + sign-pack
    end to end."""
    from ..operators.multimodal import png_pixel_rows

    docs = table(spark, sf_dir, "documents")
    px = png_pixel_rows(synthesize_png_media(docs))
    uv = px.select(
        "media_id",
        "w",
        "h",
        "x",
        "y",
        "lum",
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, w - 1), "
                "u -> transform(sequence(0, h - 1), v -> struct(u, v))))"
            )
        ).alias("uvs"),
    ).select(
        "media_id",
        "w",
        "h",
        "x",
        "y",
        "lum",
        F.col("uvs.u").alias("u"),
        F.col("uvs.v").alias("v"),
    )
    # literal DCT factor dimension, broadcast twice (width/height axes)
    fac = spark.createDataFrame(_DCT_ROWS, "s long, c long, f long, q long")
    fw = fac.select(
        F.col("s").alias("w"), F.col("c").alias("x"), F.col("f").alias("u"),
        F.col("q").alias("qx"),
    )
    fh = fac.select(
        F.col("s").alias("h"), F.col("c").alias("y"), F.col("f").alias("v"),
        F.col("q").alias("qy"),
    )
    uv = (
        uv.join(F.broadcast(fw), ["w", "x", "u"])
        .join(F.broadcast(fh), ["h", "y", "v"])
        .select(
            "media_id",
            "w",
            "h",
            "u",
            "v",
            (F.col("lum") * F.col("qx") * F.col("qy")).alias("t"),
        )
    )
    coeff = uv.groupBy("media_id", "w", "h", "u", "v").agg(
        F.sum("t").alias("c")
    )
    ph = (
        coeff.filter(~((F.col("u") == 0) & (F.col("v") == 0)))
        .groupBy("media_id")
        .agg(
            F.sum(
                F.when(
                    F.col("c") > 0,
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(v * w + u AS INT))"),
                ).otherwise(F.lit(0).cast("long"))
            )
            .cast("long")
            .alias("phash"),
        )
    )
    # Output stays at MEDIA grain: 1x1 images have only the DC
    # coefficient (dropped by design — it encodes brightness alone), so
    # left-join back to the decoded dims and emit phash=0 for them
    # rather than silently dropping the rows (they form the degenerate
    # "no structure" bucket, exactly how production pHash treats
    # constant images).
    dims = px.groupBy("media_id").agg(
        F.max("w").cast("int").alias("width"),
        F.max("h").cast("int").alias("height"),
    )
    full = dims.join(ph, "media_id", "left").withColumn(
        "phash", F.coalesce("phash", F.lit(0).cast("long"))
    )
    return full.select(
        "media_id",
        "width",
        "height",
        "phash",
        F.count("*")
        .over(Window.partitionBy("phash"))
        .cast("long")
        .alias("n_bucket"),
    )
