"""Round-9 batch 1: real multimodal pixel decode, cross-engine-proven.

``multimodal_bmp_pixel_stats`` closes the last partial component from
the round-8 verdict (multimodal payload decode): REAL uncompressed-BMP
bytes are synthesized per document (deterministic LCG pixels via the
pure-byte ``encode_bmp`` writer), the REAL ``decode_bmp_pixels`` reader
recovers the pixel grid executor-side — stride padding, bottom-up row
order and BGR channel order all exercised — and per-image channel
statistics are emitted. The DuckDB oracle computes the identical
statistics ARITHMETICALLY from the generating formula, never touching
bytes: any bug anywhere in the encode -> binary column -> Arrow batch
-> decode -> stats chain breaks the value hash. The ``poschk`` column
(position-weighted luminance sum over the top-down raster) is order-
and channel-sensitive, so a decoder that skipped the row flip or the
BGR swap fails even though means would forgive it.

Pixel value formula (BIGINT-safe in both engines, fully parenthesized
so operator precedence cannot differ):

    v(id, idx, c) = ((((id % 100003) * 8191 + idx * 131 + c * 31 + 7)
                      % 65536) * 25173 + 13849) % 65536 % 256

with idx = y * w + x over the top-down raster, c in (0,1,2) = (r,g,b),
w = id % 7 + 1 (exercising every 4-byte stride padding), h = id % 5 + 1.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import types as T
from pyspark.sql import functions as F

from ..operators.fanout import fan_out
from .catalog import register, table

_BMP_W_MOD = 7
_BMP_H_MOD = 5


def _pixel_value(media_id: int, idx: int, c: int) -> int:
    return (
        (((media_id % 100003) * 8191 + idx * 131 + c * 31 + 7) % 65536) * 25173
        + 13849
    ) % 65536 % 256


_BMP_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def synthesize_bmp_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload): one REAL BMP file per document — LCG pixels
    through the pure-byte ``encode_bmp`` writer. Arrow-batched, per-row
    work only (no shuffle); at scale this is the decode-side twin of a
    binary-column parquet scan of a crawled image corpus."""
    import numpy as np

    from ..operators.multimodal import encode_bmp

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                w = mid % _BMP_W_MOD + 1
                h = mid % _BMP_H_MOD + 1
                idx = np.arange(h * w, dtype=np.int64)
                px = np.stack(
                    [
                        ((((mid % 100003) * 8191 + idx * 131 + c * 31 + 7) % 65536)
                         * 25173 + 13849) % 65536 % 256
                        for c in (0, 1, 2)
                    ],
                    axis=1,
                ).astype(np.uint8).reshape(h, w, 3)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, _BMP_MEDIA_SCHEMA)


@register(
    "multimodal_bmp_pixel_stats",
    f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CAST(doc_id % {_BMP_W_MOD} + 1 AS BIGINT) AS w,
               CAST(doc_id % {_BMP_H_MOD} + 1 AS BIGINT) AS h
        FROM documents
    ),
    px AS (
        SELECT media_id, w, h,
               unnest(generate_series(0, w * h - 1)) AS idx
        FROM dims
    ),
    chan AS (
        SELECT media_id, w, h, idx,
               ((((media_id % 100003) * 8191 + idx * 131 + 0 * 31 + 7)
                 % 65536) * 25173 + 13849) % 65536 % 256 AS r,
               ((((media_id % 100003) * 8191 + idx * 131 + 1 * 31 + 7)
                 % 65536) * 25173 + 13849) % 65536 % 256 AS g,
               ((((media_id % 100003) * 8191 + idx * 131 + 2 * 31 + 7)
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
def multimodal_bmp_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode end to end (the round-8 verdict's item 5): the
    only bytes the stats stage sees are complete BMP files, and the
    oracle never sees bytes at all — it recomputes the statistics from
    the pixel-generating formula. Matching hashes therefore prove the
    writer and reader invert each other exactly (stride padding,
    bottom-up storage, BGR order) through the full distributed path:
    binary column -> Arrow batch -> numpy decode -> stats. Per-row work
    throughout; the only exchange is the driver's output collection."""
    from ..operators.multimodal import bmp_channel_stats

    docs = table(spark, sf_dir, "documents")
    media = synthesize_bmp_media(docs)
    return bmp_channel_stats(media)


# ---------------------------------------------------------------------------
# Semi-hard triplet mining (Schroff et al. 2015, FaceNet)
# ---------------------------------------------------------------------------

_TRIPLET_ANCHORS = 50
_TRIPLET_MARGIN = 0.05

_COS9 = (
    "round(list_sum(list_transform(generate_series(1, len(a.embedding)), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(a.embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(q.embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)"
)


@register(
    "triplet_semihard_mining",
    f"""
    WITH pairs AS (
        SELECT q.vec_id AS anchor_id, a.vec_id AS cand_id,
               q.label AS ql, a.label AS cl,
               {_COS9} AS cos_sim
        FROM embeddings a
        JOIN (SELECT * FROM embeddings WHERE vec_id < {_TRIPLET_ANCHORS}) q
          ON a.vec_id <> q.vec_id
    ),
    pos AS (
        SELECT anchor_id, cand_id AS pos_id, cos_sim AS cos_pos FROM (
            SELECT anchor_id, cand_id, cos_sim,
                   ROW_NUMBER() OVER (PARTITION BY anchor_id
                                      ORDER BY cos_sim DESC, cand_id) AS rn
            FROM pairs WHERE cl = ql
        ) WHERE rn = 1
    ),
    neg AS (
        SELECT anchor_id, cand_id AS neg_id, cos_sim AS cos_neg FROM (
            SELECT p.anchor_id, p.cand_id, p.cos_sim,
                   ROW_NUMBER() OVER (PARTITION BY p.anchor_id
                                      ORDER BY p.cos_sim DESC, p.cand_id) AS rn
            FROM pairs p JOIN pos USING (anchor_id)
            WHERE p.cl <> p.ql AND p.cos_sim < pos.cos_pos
        ) WHERE rn = 1
    )
    SELECT anchor_id, pos_id, cos_pos, neg_id, cos_neg,
           CAST(cos_neg > cos_pos - {_TRIPLET_MARGIN} AS INT) AS margin_active
    FROM pos JOIN neg USING (anchor_id)
    """,
    tags=("X-triplet-mining",),
)
def triplet_semihard_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-hard triplet mining for metric-learning batches (FaceNet,
    Schroff et al. 2015): per anchor, the positive is its most-similar
    same-label vector and the negative is the most-similar
    OTHER-label vector that is still farther than the positive
    (cos_neg < cos_pos) — the "semi-hard" band that trains stably where
    hardest-negative mining collapses; margin_active marks triplets
    inside the margin band that still produce gradient.

    Distributed shape: the {_TRIPLET_ANCHORS}-anchor frame broadcasts
    against one corpus scan (scan-parallel pair scoring, no shuffle of
    the corpus); the positive cut is a WindowGroupLimit top-1 per
    anchor, and the tiny positive frame broadcasts back onto the SAME
    pair stream for the semi-hard filter — two corpus scans total,
    nothing corpus-sized ever exchanges. 4dp-rounded cosines with
    cand_id tiebreaks keep both rankings engine-exact.

    r13 (guide §4.2, the margin_bitext pattern): the pair cosines ran
    as interpreted zip_with/aggregate lambdas — and the pair frame is
    consumed TWICE (pos and neg branches), so the interpreted scoring
    ran twice. The bounded anchor side (already a JVM broadcast) now
    also feeds a Python broadcast and the block scores vectorized in
    numpy with the SAME IEEE operation order (accumulate over
    dimensions exactly like the left fold, norms likewise, one
    multiply then one divide — each a single correctly-rounded op), so
    every double is bit-identical; cos_sim stays the engine-side
    round(, 4)."""
    import numpy as np

    from pyspark.sql import types as T

    emb = fan_out(table(spark, sf_dir, "embeddings")).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    a_rows = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _TRIPLET_ANCHORS)
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .select("vec_id", "label", "embedding")
        .collect()
    )  # bounded: the broadcast side of the old plan
    a_ids = np.asarray([r["vec_id"] for r in a_rows], dtype=np.int64)
    a_lbl = np.asarray([r["label"] for r in a_rows], dtype=np.int64)
    a_mat = np.asarray([r["embedding"] for r in a_rows], dtype=np.float64)
    abc = spark.sparkContext.broadcast((a_ids, a_lbl, a_mat))

    def score(batches):
        import pandas as pd

        ids, lbl, amat = abc.value
        na, dim = amat.shape
        na_acc = np.zeros(na)
        for j in range(dim):
            na_acc = na_acc + amat[:, j] * amat[:, j]
        a_norm = np.sqrt(na_acc)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            nx = X.shape[0]
            acc = np.zeros((nx, na))
            nx_acc = np.zeros(nx)
            for j in range(dim):
                acc = acc + X[:, j, None] * amat[None, :, j]
                nx_acc = nx_acc + X[:, j] * X[:, j]
            cos = acc / (np.sqrt(nx_acc)[:, None] * a_norm[None, :])
            yield pd.DataFrame(
                {
                    "anchor_id": np.tile(ids, nx),
                    "cand_id": np.repeat(pdf["vec_id"].to_numpy(np.int64), na),
                    "ql": np.tile(lbl, nx),
                    "cl": np.repeat(pdf["label"].to_numpy(np.int64), na),
                    "c": cos.reshape(-1),
                }
            )

    pairs = (
        emb.select("vec_id", "label", "embedding")
        .mapInPandas(
            score,
            T.StructType(
                [
                    T.StructField("anchor_id", T.LongType()),
                    T.StructField("cand_id", T.LongType()),
                    T.StructField("ql", T.LongType()),
                    T.StructField("cl", T.LongType()),
                    T.StructField("c", T.DoubleType()),
                ]
            ),
        )
        .filter(F.col("cand_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "cand_id",
            "ql",
            "cl",
            F.round("c", 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos_sim"), "cand_id")
    pos = (
        pairs.filter(F.col("cl") == F.col("ql"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("anchor_id", F.col("cand_id").alias("pos_id"), F.col("cos_sim").alias("cos_pos"))
    )
    neg = (
        pairs.filter(F.col("cl") != F.col("ql"))
        .join(F.broadcast(pos), "anchor_id")
        .filter(F.col("cos_sim") < F.col("cos_pos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("anchor_id", F.col("cand_id").alias("neg_id"), F.col("cos_sim").alias("cos_neg"))
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "pos_id",
        "cos_pos",
        "neg_id",
        "cos_neg",
        (F.col("cos_neg") > F.col("cos_pos") - _TRIPLET_MARGIN)
        .cast("int")
        .alias("margin_active"),
    )


# ---------------------------------------------------------------------------
# Neyman (optimal) stratified-sampling allocation
# ---------------------------------------------------------------------------

_NEYMAN_N = 1000


@register(
    "neyman_stratified_allocation",
    f"""
    WITH s AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_y,
               CAST(sum(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
                    AS BIGINT) AS sumsq_y
        FROM documents GROUP BY source
    ),
    st AS (
        SELECT source, n_docs,
               CAST(floor(CASE WHEN n_docs > 1
                          THEN sqrt((CAST(sumsq_y AS DOUBLE)
                                     - CAST(sum_y AS DOUBLE)
                                       * CAST(sum_y AS DOUBLE) / n_docs)
                                    / (n_docs - 1))
                          ELSE 0.0 END * 1000000 + 0.5) AS BIGINT)
                   AS s_mu
        FROM s
    ),
    tot AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS big_n,
               CAST(sum(n_docs * s_mu) AS BIGINT) AS tot_ns
        FROM st
    )
    SELECT source, n_docs,
           round(s_mu / 1000000.0, 4) AS stddev_chars,
           CAST(floor({_NEYMAN_N}.0 * n_docs / big_n + 0.5) AS BIGINT)
               AS alloc_prop,
           CAST(floor({_NEYMAN_N}.0 * n_docs * s_mu / tot_ns + 0.5) AS BIGINT)
               AS alloc_neyman
    FROM st, tot
    """,
    tags=("X-neyman-allocation",),
)
def neyman_stratified_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal (Neyman 1934) vs proportional allocation of a
    {_NEYMAN_N}-row sample across source strata: n_h proportional to
    N_h * S_h puts sample where the variance is, the textbook eval-set
    and data-audit sampling design (proportional allocation oversamples
    big homogeneous strata). One map-side-combined aggregation per
    stratum; the 20-row strata frame then folds to scalar totals — at
    100 TB the only corpus-scale work is the count/sum/sumsq scan.

    Engine-exactness: moments are EXACT BIGINT sums; the variance is
    one fixed expression over those integers (identical IEEE ops both
    engines), the stddev is micro-quantized to integer micro-units
    BEFORE the cross-strata total, so tot_ns is an exact integer sum —
    no float-summation-order hazard — and both allocations are
    floor(x + 0.5) over identically-derived doubles."""
    docs = table(spark, sf_dir, "documents")
    y = F.col("n_chars").cast("long")
    s = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(y).alias("sum_y"),
        F.sum(y * y).alias("sumsq_y"),
    )
    var = (
        F.col("sumsq_y").cast("double")
        - F.col("sum_y").cast("double") * F.col("sum_y").cast("double")
        / F.col("n_docs")
    ) / (F.col("n_docs") - 1)
    # Single-document stratum: (n_docs - 1) = 0 would make the variance
    # 0.0/0 = NaN (engine-divergent; the oracle's floor/CAST rejects it)
    # — define S_h = 0 there, identically in the oracle's CASE WHEN.
    st = s.select(
        "source",
        "n_docs",
        F.floor(
            F.when(F.col("n_docs") > 1, F.sqrt(var)).otherwise(F.lit(0.0))
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("s_mu"),
    )
    tot = st.agg(
        F.sum("n_docs").alias("big_n"),
        F.sum(F.col("n_docs") * F.col("s_mu")).alias("tot_ns"),
    )
    return st.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(F.col("s_mu") / 1000000.0, 4).alias("stddev_chars"),
        F.floor(
            F.lit(float(_NEYMAN_N)) * F.col("n_docs") / F.col("big_n") + 0.5
        )
        .cast("long")
        .alias("alloc_prop"),
        F.floor(
            F.lit(float(_NEYMAN_N)) * F.col("n_docs") * F.col("s_mu")
            / F.col("tot_ns")
            + 0.5
        )
        .cast("long")
        .alias("alloc_neyman"),
    )


# ---------------------------------------------------------------------------
# Per-source boilerplate n-gram flagging (CCNet / RefinedWeb-style)
# ---------------------------------------------------------------------------

_BOILER_NGRAM = 2
_BOILER_DF_NUM = 1  # boilerplate iff df / source_docs >= 1/5
_BOILER_DF_DEN = 5


@register(
    "boilerplate_ngram_flags",
    f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    pos AS (
        SELECT doc_id, source,
               array_to_string(w[i:i+{_BOILER_NGRAM - 1}], ' ') AS g
        FROM (SELECT doc_id, source, w,
                     unnest(generate_series(1, len(w) - {_BOILER_NGRAM - 1}))
                         AS i
              FROM toks)
    ),
    nd AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source),
    df AS (
        SELECT source, g, count(*) AS d
        FROM (SELECT DISTINCT doc_id, source, g FROM pos)
        GROUP BY source, g
    ),
    boiler AS (
        SELECT df.source, df.g
        FROM df JOIN nd USING (source)
        WHERE {_BOILER_DF_DEN} * d >= {_BOILER_DF_NUM} * n_src
    ),
    per_doc AS (
        SELECT pos.doc_id,
               count(*) AS n_pos,
               sum(CASE WHEN boiler.g IS NOT NULL THEN 1 ELSE 0 END)
                   AS n_boiler
        FROM pos LEFT JOIN boiler
          ON pos.source = boiler.source AND pos.g = boiler.g
        GROUP BY pos.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_pos, 0) AS BIGINT) AS n_pos,
           CAST(COALESCE(n_boiler, 0) AS BIGINT) AS n_boiler,
           CASE WHEN COALESCE(n_pos, 0) > 0
                THEN round(CAST(n_boiler AS DOUBLE) / n_pos, 5)
                ELSE 0.0 END AS boiler_frac
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    """,
    tags=("X-boilerplate",),
)
def boilerplate_ngram_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate flagging by document frequency (the
    CCNet / RefinedWeb "most common n-grams" filter): a
    {_BOILER_NGRAM}-gram is boilerplate within a source when it appears
    in >= {_BOILER_DF_NUM}/{_BOILER_DF_DEN} of that source's documents
    (nav bars, footers, cookie banners — text that repeats across a
    SITE, which first-owner chunk dedup cannot see because every
    occurrence after the first survives there in its owner document).
    Output is the per-document boilerplate position fraction, the
    ranking signal a cleaning pass trims by.

    Distributed shape: position fan-out is narrow; the doc-frequency
    pass aggregates DISTINCT (doc, source, gram) — map-side combined —
    into a per-(source, gram) count; the boilerplate set (grams above
    the integer-arithmetic threshold {_BOILER_DF_DEN}*d >=
    {_BOILER_DF_NUM}*n_src — no float ratio) is tiny relative to the
    corpus (bounded by per-source distinct grams / threshold), so AQE
    broadcasts the flag join at any realistic scale; the final
    per-document rollup re-shuffles gram positions by doc_id once.
    Every count is an exact integer; the only float is the final
    5dp-rounded fraction."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", F.split("text", " ").alias("w"))
    # Docs shorter than the gram width must fan out to ZERO positions:
    # sequence(1, 0) defaults to step -1 and yields [1, 0] (and slice
    # then raises INVALID_PARAMETER_VALUE.START), where the oracle's
    # generate_series(1, 0) is empty — guard with an empty array.
    pos = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.size("w") >= _BOILER_NGRAM,
                F.sequence(F.lit(1), F.size("w") - (_BOILER_NGRAM - 1)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
        "w",
    ).select(
        "doc_id",
        "source",
        F.concat_ws(" ", F.slice("w", F.col("i"), _BOILER_NGRAM)).alias("g"),
    )
    nd = docs.groupBy("source").agg(F.count("*").alias("n_src"))
    df = (
        pos.select("doc_id", "source", "g")
        .distinct()
        .groupBy("source", "g")
        .agg(F.count("*").alias("d"))
    )
    boiler = (
        df.join(F.broadcast(nd), "source")
        .filter(_BOILER_DF_DEN * F.col("d") >= _BOILER_DF_NUM * F.col("n_src"))
        .select("source", "g", F.lit(1).alias("is_boiler"))
    )
    per_doc = (
        pos.join(boiler, ["source", "g"], "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_pos"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0)))
            .cast("long")
            .alias("n_boiler"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_pos"), F.lit(0)).cast("long").alias("n_pos"),
            F.coalesce(F.col("n_boiler"), F.lit(0)).cast("long").alias("n_boiler"),
            F.when(
                F.coalesce(F.col("n_pos"), F.lit(0)) > 0,
                F.round(F.col("n_boiler").cast("double") / F.col("n_pos"), 5),
            )
            .otherwise(F.lit(0.0))
            .alias("boiler_frac"),
        )
    )
