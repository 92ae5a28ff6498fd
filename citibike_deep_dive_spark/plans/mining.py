"""Round-8 late additions: corpus-mining / data-selection methods from
the published training-data literature that were still missing from the
catalog — robust winnowing fingerprints (Schleimer et al. 2003, the MOSS
algorithm), margin-based bitext mining (Artetxe & Schwenk 2019),
prototype-distance hard-example pruning (Sorscher et al. 2022, "Beyond
neural scaling laws"), token-budget water-filling under epoch caps
(the allocation problem of Muennighoff et al. 2023, "Scaling
data-constrained language models"), and embedding-space eval-set
decontamination (the semantic complement of
``decontamination_ngram_overlap``).

Every query follows the catalog determinism rules (catalog.py module
docstring): identical aliases on both engines, explicit tiebreaks on
every ranking, rounding at the edge only, integer-packed argmax where a
"max value, tie min id" is needed (winning-pattern 11), and the shared
md5 hash family (functions/portable.py) wherever a bucket id must match
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from ..operators.fanout import fan_out
from .catalog import register, table

# One-slot per-worker cache for the bitext y side (margin_bitext_mining):
# keyed by (pid, path) so a reused Python worker (spark.python.worker.
# reuse=true) loads the bounded odd-id shard once and every later task —
# and a forked worker, and a rebuilt catalog — stays correct. One slot:
# a new path (another SF dir) evicts the old arrays instead of leaking.
_ODD_EMB_SLOT: list = [None, None]  # [key, (ids, mat)]


def _odd_embeddings(path: str):
    """Materialize the odd-vec_id half of the embeddings table from the
    parquet source, as (int64 ids, float64 matrix) — executed inside
    the scoring map's task (NOT at plan-build time), so the y-side scan
    is paid inside the timed region like every other input scan. The
    float32 -> float64 upcast is exact, matching the plan-side
    cast(embedding as array<double>)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    key = (os.getpid(), path)
    if _ODD_EMB_SLOT[0] == key:
        return _ODD_EMB_SLOT[1]
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    vec = t.column("vec_id").to_numpy()
    col = t.column("embedding").combine_chunks()
    offs = col.offsets.to_numpy()
    widths = np.diff(offs)
    vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    if widths.size and (widths == widths[0]).all():
        # slice by the offset window: a sliced ListArray's values buffer
        # may start before offsets[0]
        mat = vals[offs[0] : offs[-1]].reshape(len(widths), int(widths[0]))
    else:  # ragged fallback (never the case for this corpus)
        mat = np.asarray(col.to_pylist(), dtype=np.float64)
    odd = (vec % 2) == 1
    out = (vec[odd].astype(np.int64), mat[odd])
    _ODD_EMB_SLOT[0] = key
    _ODD_EMB_SLOT[1] = out
    return out


# ---------------------------------------------------------------------------
# Robust winnowing (Schleimer, Wilkerson & Aiken 2003)
# ---------------------------------------------------------------------------

_WIN_K = 4  # words per k-gram
_WIN_W = 5  # winnowing window (guarantee: any match >= w+k-1 words shares a print)
_WIN_HMOD = 1 << 20  # hash range; pack = hash * 2^20 + (2^20-1 - pos) < 2^40


@register(
    "winnowing_fingerprints",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws
        FROM documents
        WHERE len(string_split(lower(text), ' ')) >= {_WIN_K + _WIN_W - 1}
    ),
    grams AS (
        SELECT doc_id,
               list_transform(generate_series(1, len(ws) - {_WIN_K - 1}), i ->
                   ('0x' || substr(md5(array_to_string(
                       list_transform(generate_series(i, i + {_WIN_K - 1}), j -> ws[j]),
                       ' ')), 1, 15))::BIGINT % {_WIN_HMOD}) AS gh
        FROM toks
    ),
    packs AS (
        SELECT doc_id, len(gh) AS n_grams,
               list_transform(generate_series(1, len(gh) - {_WIN_W - 1}), i ->
                   list_min(list_transform(generate_series(i, i + {_WIN_W - 1}), j ->
                       gh[j] * {_WIN_HMOD} + ({_WIN_HMOD - 1} - j)))) AS sel
        FROM grams
    )
    SELECT doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(len(sel) AS BIGINT) AS n_windows,
           CAST(len(list_distinct(sel)) AS BIGINT) AS n_fingerprints,
           CAST(len(list_distinct(list_transform(sel, p -> p // {_WIN_HMOD})))
                AS BIGINT) AS n_distinct_hashes,
           round(CAST(len(list_distinct(sel)) AS DOUBLE)
                 / CAST(len(sel) AS DOUBLE), 4) AS fingerprint_density
    FROM packs
    """,
    tags=("X-winnowing",),
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust winnowing (Schleimer et al. 2003 §4): hash every
    overlapping k-gram, slide a w-hash window, and select each window's
    minimum hash — rightmost occurrence on ties, which is exactly what
    the integer pack ``hash * 2^20 + (2^20-1 - pos)`` turns into a plain
    ``array_min`` (winning-pattern 11; no struct compare, no per-window
    sort). The guarantee: any two documents sharing a run of at least
    w + k - 1 words share at least one selected fingerprint, with
    expected density 2/(w+1) — the fingerprint sets feed a MOSS-style
    plagiarism/near-dup index at ~1/3 the k-gram volume.

    Distributed shape: pure narrow codegen — one scan, zero shuffles;
    every per-doc step is nested higher-order functions over the split
    array (positions ride as index arithmetic, the
    phrase_search_positional lesson). At 100 TB this is the map side of
    a fingerprint-postings build; the selected (hash, doc) pairs would
    feed the same explode + groupBy as inverted_index_postings. Hash ids
    come from the portable md5 family so the oracle is engine-exact."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    ws = F.split(F.lower("text"), " ")
    k, w, hmod = _WIN_K, _WIN_W, _WIN_HMOD
    gh = F.expr(
        f"transform(sequence(1, size(ws) - {k - 1}), i -> "
        f"CAST(conv(substring(md5(array_join(slice(ws, i, {k}), ' ')), 1, 15), 16, 10)"
        f" AS BIGINT) % {hmod})"
    )
    sel = F.expr(
        f"transform(sequence(1, size(gh) - {w - 1}), i -> "
        f"array_min(transform(sequence(i, i + {w - 1}), j -> "
        f"element_at(gh, j) * {hmod}L + ({hmod - 1}L - j))))"
    )
    return (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= k + w - 1)
        .select("doc_id", gh.alias("gh"))
        .select("doc_id", F.size("gh").cast("long").alias("n_grams"), sel.alias("sel"))
        .select(
            "doc_id",
            "n_grams",
            F.size("sel").cast("long").alias("n_windows"),
            F.size(F.array_distinct("sel")).cast("long").alias("n_fingerprints"),
            F.size(
                F.array_distinct(F.expr(f"transform(sel, p -> p div {hmod})"))
            )
            .cast("long")
            .alias("n_distinct_hashes"),
            F.round(
                F.size(F.array_distinct("sel")).cast("double")
                / F.size("sel").cast("double"),
                4,
            ).alias("fingerprint_density"),
        )
    )


# ---------------------------------------------------------------------------
# Margin-based bitext mining (Artetxe & Schwenk 2019)
# ---------------------------------------------------------------------------

_MARGIN_K = 4  # neighborhood size for the margin denominator

_MINE_COS = """
    list_sum(list_transform(generate_series(1, len({a})),
        i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


@register(
    "margin_bitext_mining",
    f"""
    WITH x AS (SELECT vec_id AS src_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
    y AS (SELECT vec_id AS tgt_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
    p AS (
        SELECT src_id, tgt_id,
               CAST(round(({_MINE_COS.format(a="x.embedding", b="y.embedding")})
                    * 10000) AS BIGINT) AS cos_i
        FROM x CROSS JOIN y
    ),
    ranked AS (
        SELECT src_id, tgt_id, cos_i,
               ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY cos_i DESC, tgt_id) AS rn_s,
               ROW_NUMBER() OVER (PARTITION BY tgt_id ORDER BY cos_i DESC, src_id) AS rn_t
        FROM p
    ),
    denom AS (
        SELECT src_id, tgt_id, cos_i,
               sum(CASE WHEN rn_s <= {_MARGIN_K} THEN cos_i END)
                   OVER (PARTITION BY src_id) AS dx,
               sum(CASE WHEN rn_t <= {_MARGIN_K} THEN cos_i END)
                   OVER (PARTITION BY tgt_id) AS dy
        FROM ranked
    ),
    margins AS (
        SELECT src_id, tgt_id, cos_i,
               CAST(cos_i AS DOUBLE) * {2 * _MARGIN_K} / CAST(dx + dy AS DOUBLE)
                   AS margin,
               ROW_NUMBER() OVER (PARTITION BY src_id
                   ORDER BY CAST(cos_i AS DOUBLE) * {2 * _MARGIN_K}
                            / CAST(dx + dy AS DOUBLE) DESC, tgt_id) AS rm_s,
               ROW_NUMBER() OVER (PARTITION BY tgt_id
                   ORDER BY CAST(cos_i AS DOUBLE) * {2 * _MARGIN_K}
                            / CAST(dx + dy AS DOUBLE) DESC, src_id) AS rm_t
        FROM denom
    )
    SELECT src_id, tgt_id,
           round(CAST(cos_i AS DOUBLE) / 10000.0, 4) AS cos_sim,
           round(margin, 5) AS margin_score
    FROM margins WHERE rm_s = 1 AND rm_t = 1
    """,
    tags=("X-bitext-margin",),
)
def margin_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based parallel-corpus mining (Artetxe & Schwenk 2019 §3,
    the LASER/CCMatrix criterion): raw cosine over-selects hub vectors,
    so each candidate pair is scored by its RATIO margin — cos(x, y)
    normalized by the mean cosine of each side's k nearest neighbors in
    the OTHER side — and only mutual-best pairs by margin survive.
    margin(x, y) = cos(x, y) / ((avg_k NN_Y(x) + avg_k NN_X(y)) / 2),
    here as the integer-exact form cos_i * 2k / (dx + dy): cosines are
    scaled to 1e4 integers BEFORE the neighborhood sums, so every
    engine-order-sensitive aggregation in the pipeline is integer
    arithmetic and the only doubles are single IEEE divisions
    (engine-exact); id tiebreaks make both rankings total.

    Distributed shape: the even side scans once with the odd side
    broadcast (bitext corpora are per-language-pair shards — the smaller
    language broadcasts); the scored pair frame is lazily checkpointed
    because its window consumers would otherwise each rebuild the
    64-term dot products (the multiply-consumed-frame rule), and the
    top-k neighborhood sums ride the rank windows as
    cumulative-sum-at-rank-k over the same exchange — four pair-frame
    passes instead of the naive six. At 100 TB the cross join is
    replaced by an ANN
    shortlist (ann_ivfpq_rerank_exact) feeding the SAME margin/mutual
    plan — the normalization and mutual-best logic is shortlist-local."""
    import numpy as np

    from pyspark.sql import types as T

    emb = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    x = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"), F.col("v").alias("xv")
    )
    # r13 (guide §4.2): the dense scoring block ran as interpreted
    # zip_with/aggregate lambdas over the crossJoin — ~1 ms per 64-term
    # dot product, 18.8 s to materialize the checkpoint at sf0.1. The
    # odd side was ALREADY a JVM broadcast (crossJoin(F.broadcast));
    # the block scoring runs vectorized in numpy with the SAME IEEE
    # operation order — the accumulation loops over dimensions exactly
    # like the left fold (acc + x_j*y_j per step), norms likewise,
    # sqrt/divide/multiply are single correctly-rounded IEEE ops — so
    # every double is bit-identical and the engine-side round() sees
    # the same values. cos_i stays a Spark-side round.
    #
    # r14 (ADVICE r13): the r13 form ran y.collect() at PLAN-BUILD time,
    # relocating the y-side scan outside every timed region. The odd
    # half now materializes INSIDE the map on first use — each task
    # reads the (bounded, per-language-pair-shard) y side straight from
    # the parquet source, cached per worker process — so the cost is
    # back inside execution, no driver collect or broadcast handle
    # exists at all, and the per-task peak is tiled (the r13 form
    # allocated one (nx, ny) float64 grid per 10k-row Arrow batch).
    emb_path = f"{sf_dir}/embeddings.parquet"

    def run(batches):
        import pandas as pd

        ids, ymat = _odd_embeddings(emb_path)
        ny, dim = ymat.shape
        ny_acc = np.zeros(ny)
        for j in range(dim):
            ny_acc = ny_acc + ymat[:, j] * ymat[:, j]
        y_norm = np.sqrt(ny_acc)
        # x-tile bound: ~4M grid cells (32 MB float64 accumulator) per
        # allocation, independent of the y side's row count. Tiling x
        # cannot change any (i, j) cell's accumulation order.
        tile = max(1, 4_000_000 // max(ny, 1))
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["xv"]])
            sid = pdf["src_id"].to_numpy(np.int64)
            for t0 in range(0, X.shape[0], tile):
                Xt = X[t0 : t0 + tile]
                nx = Xt.shape[0]
                acc = np.zeros((nx, ny))
                nx_acc = np.zeros(nx)
                for j in range(dim):
                    acc = acc + Xt[:, j, None] * ymat[None, :, j]
                    nx_acc = nx_acc + Xt[:, j] * Xt[:, j]
                cos = acc / (np.sqrt(nx_acc)[:, None] * y_norm[None, :]) * 10000.0
                yield pd.DataFrame(
                    {
                        "src_id": np.repeat(sid[t0 : t0 + tile], ny),
                        "tgt_id": np.tile(ids, nx),
                        "c": cos.reshape(-1),
                    }
                )

    scored = x.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("src_id", T.LongType()),
                T.StructField("tgt_id", T.LongType()),
                T.StructField("c", T.DoubleType()),
            ]
        ),
    )
    pairs = truncate_lineage(
        scored.select(
            "src_id", "tgt_id", F.round("c", 0).cast("long").alias("cos_i")
        ),
        eager=False,
    )
    return _margin_from_pairs(pairs)


def _margin_from_pairs(pairs: DataFrame) -> DataFrame:
    """Shared margin/mutual-best tail over a scored (src_id, tgt_id,
    cos_i) candidate frame — identical algebra whether the candidates
    came from the exhaustive cross join (margin_bitext_mining) or an
    LSH shortlist (margin_bitext_ann_shortlist); Artetxe & Schwenk's
    margin is shortlist-local by definition."""
    k = _MARGIN_K
    # Neighborhood top-k sums as map-combined groupBy aggregations (sort
    # the per-group value array, not the global frame): no 1M-row sort
    # exchange ever happens. The per-side sums broadcast back onto the
    # pair frame, and the two mutual-best argmaxes are struct-max
    # aggregations -- "max margin, tie min id" as one field-wise max
    # (winning-pattern 11), replacing two more full-sort rank windows.
    # Measured 1.49 -> 1.22 s at sf0.1 vs the six-window plan.
    top4 = F.expr(
        "aggregate(slice(array_sort(collect_list(cos_i), (l, r) -> int(r - l)),"
        " 1, 4), 0L, (a, b) -> a + b)"
    )
    dxs = pairs.groupBy("src_id").agg(top4.alias("dx"))
    dys = pairs.groupBy("tgt_id").agg(top4.alias("dy"))
    margin = (
        F.col("cos_i").cast("double")
        * F.lit(2 * k)
        / (F.col("dx") + F.col("dy")).cast("double")
    )
    margins = (
        pairs.join(F.broadcast(dxs), "src_id")
        .join(F.broadcast(dys), "tgt_id")
        .select("src_id", "tgt_id", "cos_i", margin.alias("margin"))
    )
    best_s = margins.groupBy("src_id").agg(
        F.max(
            F.struct(
                F.col("margin"),
                (-F.col("tgt_id")).alias("neg_tgt"),
                F.col("tgt_id"),
                F.col("cos_i"),
            )
        ).alias("b")
    )
    best_t = margins.groupBy("tgt_id").agg(
        F.max(
            F.struct(F.col("margin"), (-F.col("src_id")).alias("neg_src"), F.col("src_id"))
        ).alias("b")
    )
    return (
        best_s.select(
            "src_id",
            F.col("b.tgt_id").alias("tgt_id"),
            F.col("b.cos_i").alias("cos_i"),
            F.col("b.margin").alias("margin"),
        )
        .join(
            best_t.select(F.col("b.src_id").alias("src_id"), "tgt_id"),
            ["src_id", "tgt_id"],
        )
        .select(
            "src_id",
            "tgt_id",
            F.round(F.col("cos_i").cast("double") / 10000.0, 4).alias("cos_sim"),
            F.round("margin", 5).alias("margin_score"),
        )
    )



# ---------------------------------------------------------------------------
# Margin bitext mining over a sign-LSH shortlist (the 100 TB path)
# ---------------------------------------------------------------------------

_MARGIN_LSH_BITS = 6  # 64 buckets at test scale; bits grow with the corpus


@register(
    "margin_bitext_ann_shortlist",
    f"""
    WITH b AS (
        SELECT vec_id, embedding,
               ((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END) + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)) AS bucket
        FROM embeddings
    ),
    x AS (SELECT vec_id AS src_id, embedding, bucket FROM b WHERE vec_id % 2 = 0),
    y AS (SELECT vec_id AS tgt_id, embedding, bucket FROM b WHERE vec_id % 2 = 1),
    p AS (
        SELECT src_id, tgt_id,
               CAST(round(({_MINE_COS.format(a="x.embedding", b="y.embedding")})
                    * 10000) AS BIGINT) AS cos_i
        FROM x JOIN y USING (bucket)
    ),
    ranked AS (
        SELECT src_id, tgt_id, cos_i,
               ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY cos_i DESC, tgt_id) AS rn_s,
               ROW_NUMBER() OVER (PARTITION BY tgt_id ORDER BY cos_i DESC, src_id) AS rn_t
        FROM p
    ),
    denom AS (
        SELECT src_id, tgt_id, cos_i,
               sum(CASE WHEN rn_s <= {_MARGIN_K} THEN cos_i END)
                   OVER (PARTITION BY src_id) AS dx,
               sum(CASE WHEN rn_t <= {_MARGIN_K} THEN cos_i END)
                   OVER (PARTITION BY tgt_id) AS dy
        FROM ranked
    ),
    margins AS (
        SELECT src_id, tgt_id, cos_i,
               CAST(cos_i AS DOUBLE) * {2 * _MARGIN_K} / CAST(dx + dy AS DOUBLE)
                   AS margin,
               ROW_NUMBER() OVER (PARTITION BY src_id
                   ORDER BY CAST(cos_i AS DOUBLE) * {2 * _MARGIN_K}
                            / CAST(dx + dy AS DOUBLE) DESC, tgt_id) AS rm_s,
               ROW_NUMBER() OVER (PARTITION BY tgt_id
                   ORDER BY CAST(cos_i AS DOUBLE) * {2 * _MARGIN_K}
                            / CAST(dx + dy AS DOUBLE) DESC, src_id) AS rm_t
        FROM denom
    )
    SELECT src_id, tgt_id,
           round(CAST(cos_i AS DOUBLE) / 10000.0, 4) AS cos_sim,
           round(margin, 5) AS margin_score
    FROM margins WHERE rm_s = 1 AND rm_t = 1
    """,
    tags=("X-bitext-margin-ann",),
)
def margin_bitext_ann_shortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION form of margin_bitext_mining — the same Artetxe &
    Schwenk margin/mutual-best algebra fed by a sign-LSH shortlist
    instead of the exhaustive cross join (which OOMs at sf1 by design:
    625M materialized pairs; BASELINE.md). Candidates must share a
    {_MARGIN_LSH_BITS}-bit random-hyperplane bucket
    (operators/similarity.sign_lsh_bucket — the same family as
    embedding_near_dup_sign_lsh), so pair generation is an EQUI-join on
    a uniform integer key: per-bucket work is (n/2^bits)^2 and bits
    grows with the corpus, exactly the cells-proportional-to-corpus
    contract semdedup_prune_subcells established. Margins and
    mutual-best are shortlist-local by definition (Artetxe & Schwenk
    2019 compute them over the k-NN shortlist, never the full cross),
    so the downstream is the SAME _margin_from_pairs tail, verbatim.

    Distributed shape: per-row bucket bits (codegen), one hash
    equi-join on bucket, then the shared integer-exact margin tail —
    no broadcast of a data-grain side, no quadratic blow-up at any
    scale."""
    from ..operators.similarity import sign_lsh_bucket

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        sign_lsh_bucket(F.col("embedding"), bits=_MARGIN_LSH_BITS).alias("bucket"),
    )
    dot = F.aggregate(
        F.zip_with("xv", "yv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda t: t * t), F.lit(0.0), lambda acc, v: acc + v
            )
        )

    x = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"), F.col("v").alias("xv"), "bucket"
    )
    y = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"), F.col("v").alias("yv"), "bucket"
    )
    cos_i = F.round(dot / (norm(F.col("xv")) * norm(F.col("yv"))) * 10000, 0).cast(
        "long"
    )
    pairs = truncate_lineage(
        x.join(y, "bucket").select("src_id", "tgt_id", cos_i.alias("cos_i")),
        eager=False,
    )
    return _margin_from_pairs(pairs)


# ---------------------------------------------------------------------------
# Prototype-distance hard-example pruning (Sorscher et al. 2022)
# ---------------------------------------------------------------------------


@register(
    "prototype_hard_keep",
    """
    WITH c AS (
        SELECT vec_id AS cluster_id, embedding AS centroid
        FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
        SELECT e.vec_id, c.cluster_id,
               round(list_sum(list_transform(generate_series(1, len(e.embedding)),
                   i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.centroid[i] AS DOUBLE))
                      * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.centroid[i] AS DOUBLE)))), 6)
                   AS d2
        FROM embeddings e CROSS JOIN c
    ),
    assigned AS (
        SELECT vec_id, cluster_id, d2 FROM (
            SELECT vec_id, cluster_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster_id) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    ranked AS (
        SELECT vec_id, cluster_id, d2,
               ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY d2 DESC, vec_id)
                   AS hard_rank,
               count(*) OVER (PARTITION BY cluster_id) AS n_cluster
        FROM assigned
    )
    SELECT vec_id, CAST(cluster_id AS INT) AS cluster_id, d2 AS proto_dist,
           CAST(hard_rank AS BIGINT) AS hard_rank
    FROM ranked WHERE hard_rank <= (n_cluster + 1) // 2
    """,
    tags=("X-prototype-prune",),
)
def prototype_hard_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-supervised prototype pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws"): cluster the embedding space, score every
    example by its distance to its cluster prototype, and KEEP THE HARD
    HALF — the examples farthest from their prototype — because easy
    (prototypical) examples are the ones a data-constrained run can drop
    with the least loss. Same fixed centroids as
    ivf_fixed_centroid_assignment (vectors 0..7), squared-L2 rounded at
    6dp with cluster-id tiebreak for an engine-total argmin; the keep
    rule is the integer form hard_rank <= (n+1) div 2 so the cut is
    exact on both engines at any cluster size.

    Distributed shape: one corpus scan with the 8-row centroid frame
    broadcast, one exchange keyed by vec_id for the argmin window, one
    keyed by cluster for the rank-and-count window (both windows on one
    sort each). At 100 TB the centroids come from ivf_kmeans_cells and
    the per-cluster rank is exactly the WindowGroupLimit shape —
    per-cluster top-(n/2) pushes the cut below the exchange."""
    emb = table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    v = F.col("embedding").cast("array<double>")
    d2 = F.aggregate(
        F.zip_with(v, F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    scored = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(centroids))
        .select("vec_id", "cluster_id", F.round(d2, 6).alias("d2"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy("d2", "cluster_id")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster_id", "d2")
    )
    w_rank = Window.partitionBy("cluster_id").orderBy(F.desc("d2"), "vec_id")
    w_cnt = Window.partitionBy("cluster_id")
    return (
        assigned.select(
            "vec_id",
            "cluster_id",
            "d2",
            F.row_number().over(w_rank).alias("hard_rank"),
            F.count("*").over(w_cnt).alias("n_cluster"),
        )
        .filter(F.expr("hard_rank <= (n_cluster + 1) div 2"))
        .select(
            "vec_id",
            "cluster_id",
            F.col("d2").alias("proto_dist"),
            F.col("hard_rank").cast("long").alias("hard_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget water-filling under epoch caps (Muennighoff et al. 2023)
# ---------------------------------------------------------------------------

_WF_MAX_EPOCHS = 2  # cap: no source repeats more than 2 epochs
_WF_BUDGET_NUM, _WF_BUDGET_DEN = 3, 2  # budget = 1.5x the unique-token pool


@register(
    "token_budget_waterfill",
    f"""
    WITH toks AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    per_source AS (
        SELECT source, CAST(count(*) AS BIGINT) AS avail_tokens,
               CAST(count(DISTINCT tok) AS BIGINT) AS vocab_w
        FROM toks GROUP BY 1
    ),
    sized AS (
        SELECT source, avail_tokens, vocab_w,
               avail_tokens * {_WF_MAX_EPOCHS} AS cap_tokens,
               CAST(avail_tokens * {_WF_MAX_EPOCHS} AS DOUBLE)
                   / CAST(vocab_w AS DOUBLE) AS fill_ratio,
               sum(avail_tokens) OVER () AS total_avail,
               sum(vocab_w) OVER () AS total_w,
               coalesce(sum(avail_tokens * {_WF_MAX_EPOCHS}) OVER (
                   ORDER BY CAST(avail_tokens * {_WF_MAX_EPOCHS} AS DOUBLE)
                            / CAST(vocab_w AS DOUBLE), source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_cap_excl,
               coalesce(sum(vocab_w) OVER (
                   ORDER BY CAST(avail_tokens * {_WF_MAX_EPOCHS} AS DOUBLE)
                            / CAST(vocab_w AS DOUBLE), source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_w_excl
        FROM per_source
    ),
    cands AS (
        SELECT *,
               (total_avail * {_WF_BUDGET_NUM}) // {_WF_BUDGET_DEN} AS budget,
               CAST((total_avail * {_WF_BUDGET_NUM}) // {_WF_BUDGET_DEN}
                    - cum_cap_excl AS DOUBLE)
                   / CAST(total_w - cum_w_excl AS DOUBLE) AS lam_cand
        FROM sized
    ),
    lam AS (
        SELECT lam_cand AS lam FROM (
            SELECT lam_cand, fill_ratio,
                   ROW_NUMBER() OVER (ORDER BY fill_ratio, source) AS rn
            FROM cands WHERE lam_cand <= fill_ratio
        ) WHERE rn = 1
    )
    SELECT s.source, s.avail_tokens, s.cap_tokens,
           least(s.cap_tokens,
                 CAST(floor(lam.lam * CAST(s.vocab_w AS DOUBLE)) AS BIGINT))
               AS alloc_tokens,
           round(CAST(least(s.cap_tokens,
                 CAST(floor(lam.lam * CAST(s.vocab_w AS DOUBLE)) AS BIGINT))
                 AS DOUBLE) / CAST(s.avail_tokens AS DOUBLE), 4) AS epochs,
           s.cap_tokens <= CAST(floor(lam.lam * CAST(s.vocab_w AS DOUBLE)) AS BIGINT)
               AS at_cap
    FROM sized s CROSS JOIN lam
    """,
    tags=("X-waterfill",),
)
def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation for data-constrained training (the
    planning problem behind Muennighoff et al. 2023): given a total
    training budget of 1.5x the unique-token pool, allocate tokens
    across sources proportionally to a per-source value weight (here:
    vocabulary size, an information proxy), capped at 2 epochs per
    source — repeating a source beyond a few epochs has rapidly decaying
    value, so capped sources' leftover budget re-waterfalls onto the
    rest. Classic water-filling, solved closed-form: sort sources by
    cap/weight, and the water level λ is the first prefix candidate
    (budget − Σ caps already bound) / (Σ weights not yet bound) that
    does not overflow its own source's cap; alloc = min(cap, λ·w).
    Every order-sensitive sum is integer (token counts); λ and the
    allocations involve only single IEEE divisions/multiplications, so
    both engines agree bit-for-bit with rounding only at the edge.

    Distributed shape: ONE data-grain pass (token explode feeding a
    per-source count + count-distinct aggregation); everything after is
    window arithmetic on a rows-=-sources frame, lazily checkpointed for
    its two consumers (λ probe + final allocation). At 100 TB the
    per-source stats frame is still |sources| rows — the solve costs
    nothing more at any corpus size, which is the point of doing the
    allocation analytically instead of simulating it."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    # r14 checkpoint audit: per_source feeds ONLY the (checkpointed)
    # sized frame — its own checkpoint was a redundant write+read inside
    # sized's one-time materialization, dropped.
    per_source = (
        docs.select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .groupBy("source")
        .agg(
            F.count("*").alias("avail_tokens"),
            F.countDistinct("tok").alias("vocab_w"),
        )
    )
    me, bn, bd = _WF_MAX_EPOCHS, _WF_BUDGET_NUM, _WF_BUDGET_DEN
    cap = F.col("avail_tokens") * me
    ratio = cap.cast("double") / F.col("vocab_w").cast("double")
    w_all = Window.partitionBy()
    w_pfx = Window.orderBy("fill_ratio", "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sized = per_source.select(
        "source",
        "avail_tokens",
        "vocab_w",
        cap.alias("cap_tokens"),
        ratio.alias("fill_ratio"),
    ).select(
        "*",
        F.sum("avail_tokens").over(w_all).alias("total_avail"),
        F.sum("vocab_w").over(w_all).alias("total_w"),
        F.coalesce(F.sum("cap_tokens").over(w_pfx), F.lit(0)).alias("cum_cap_excl"),
        F.coalesce(F.sum("vocab_w").over(w_pfx), F.lit(0)).alias("cum_w_excl"),
    )
    sized = truncate_lineage(sized, eager=False)
    budget = F.expr(f"(total_avail * {bn}) div {bd}")
    lam_cand = (budget - F.col("cum_cap_excl")).cast("double") / (
        F.col("total_w") - F.col("cum_w_excl")
    ).cast("double")
    lam = (
        sized.select("source", "fill_ratio", lam_cand.alias("lam_cand"))
        .filter(F.col("lam_cand") <= F.col("fill_ratio"))
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("fill_ratio", "source"))
        )
        .filter(F.col("rn") == 1)
        .select(F.col("lam_cand").alias("lam"))
    )
    alloc = F.least(
        F.col("cap_tokens"),
        F.floor(F.col("lam") * F.col("vocab_w").cast("double")).cast("long"),
    )
    return (
        sized.crossJoin(F.broadcast(lam))
        .select(
            "source",
            "avail_tokens",
            "cap_tokens",
            alloc.alias("alloc_tokens"),
            F.round(
                alloc.cast("double") / F.col("avail_tokens").cast("double"), 4
            ).alias("epochs"),
            (
                F.col("cap_tokens")
                <= F.floor(F.col("lam") * F.col("vocab_w").cast("double")).cast("long")
            ).alias("at_cap"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-space eval-set decontamination
# ---------------------------------------------------------------------------

_DECON_TAU_I = 3200  # cosine >= 0.32 (scaled 1e4) flags contamination
_DECON_PACK = 1 << 21  # pack = (cos_i + 10000) * 2^21 + (2^21-1 - eval_id)


@register(
    "decontamination_semantic",
    f"""
    WITH ev AS (
        SELECT vec_id AS eval_id, embedding FROM embeddings WHERE vec_id % 10 = 0
    ),
    tr AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 != 0
    ),
    packs AS (
        SELECT tr.vec_id,
               max((CAST(round(({_MINE_COS.format(a="tr.embedding", b="ev.embedding")})
                        * 10000) AS BIGINT) + 10000) * {_DECON_PACK}
                   + ({_DECON_PACK - 1} - ev.eval_id)) AS pack
        FROM tr CROSS JOIN ev
        GROUP BY 1
    )
    SELECT vec_id,
           CAST({_DECON_PACK - 1} - pack % {_DECON_PACK} AS BIGINT) AS nearest_eval_id,
           round(CAST(pack // {_DECON_PACK} - 10000 AS DOUBLE) / 10000.0, 4)
               AS max_cos_sim,
           pack // {_DECON_PACK} - 10000 >= {_DECON_TAU_I} AS contaminated
    FROM packs
    """,
    tags=("X-decon-semantic",),
)
def decontamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: flag training vectors whose
    cosine to ANY eval-set vector exceeds a threshold — the semantic
    complement of decontamination_ngram_overlap, catching paraphrased or
    reformatted eval leakage that exact n-grams miss (the protocol used
    for modern LLM eval hygiene, e.g. the embedding-similarity decon in
    the Phi / GPT-4 technical reports). The per-train argmax over eval
    neighbors is ONE integer-packed max aggregation (winning-pattern 11):
    pack = (cos_i + 10000) * 2^21 + (2^21-1 - eval_id), the +10000 shift
    keeping negative cosines away from floor-vs-truncate division
    divergence; unpack yields both the nearest eval id (min id on ties)
    and the max similarity, with no struct compare, no window.

    Distributed shape: one training-corpus scan with the eval side
    broadcast (eval suites are tiny by construction) and one map-side
    combined aggregation keyed by vec_id — at 100 TB this is the
    cheapest possible all-train-x-all-eval screen, and the same plan
    accepts an LSH-bucketed eval side (embedding_near_dup_sign_lsh) when
    the eval suite itself grows."""
    emb = (
        fan_out(table(spark, sf_dir, "embeddings"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    ev = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("eval_id"), F.col("v").alias("yv")
    )
    tr = emb.filter(F.col("vec_id") % 10 != 0).select(
        "vec_id", F.col("v").alias("xv")
    )
    dot = F.aggregate(
        F.zip_with("xv", "yv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda t: t * t), F.lit(0.0), lambda acc, v: acc + v
            )
        )

    cos_i = F.round(dot / (norm(F.col("xv")) * norm(F.col("yv"))) * 10000, 0).cast(
        "long"
    )
    m = _DECON_PACK
    pack = (cos_i + 10000) * m + (F.lit(m - 1) - F.col("eval_id"))
    packs = (
        tr.crossJoin(F.broadcast(ev))
        .select("vec_id", pack.alias("pack"))
        .groupBy("vec_id")
        .agg(F.max("pack").alias("pack"))
    )
    return packs.select(
        "vec_id",
        (F.lit(m - 1) - F.col("pack") % m).cast("long").alias("nearest_eval_id"),
        F.round(
            (F.expr(f"pack div {m}") - 10000).cast("double") / 10000.0, 4
        ).alias("max_cos_sim"),
        (F.expr(f"pack div {m}") - 10000 >= _DECON_TAU_I).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# k-center greedy coreset selection (Gonzalez 1985; Sener & Savarese 2018)
# ---------------------------------------------------------------------------

_KC_ROUNDS = 7  # selects 8 centers total (round 0 = min vec_id seed)
_KC_PACK = 1 << 21  # pack = dist_micro * 2^21 + (2^21-1 - vec_id)


def _kcenter_oracle() -> str:
    """Unrolled water-level SQL for the greedy k-center loop: round r's
    pick is the vector maximizing min distance to rounds 0..r-1's
    centers (micro-unit integer distance, min-id tiebreak via the
    integer pack)."""
    d2 = """list_sum(list_transform(generate_series(1, len(e.embedding)),
        i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))
           * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))))"""
    m = _KC_PACK
    parts = ["c0 AS (SELECT min(vec_id) AS id FROM embeddings)"]
    prev_ids = "SELECT id FROM c0"
    for r in range(1, _KC_ROUNDS + 1):
        parts.append(f"""ctr{r} AS ({prev_ids}),
    mind{r} AS (
        SELECT e.vec_id,
               min(CAST(round(({d2}) * 1000000) AS BIGINT)) AS di
        FROM embeddings e
        CROSS JOIN (SELECT embedding FROM embeddings
                    WHERE vec_id IN (SELECT id FROM ctr{r})) c
        WHERE e.vec_id NOT IN (SELECT id FROM ctr{r})
        GROUP BY 1
    ),
    pick{r} AS (
        SELECT CAST({m - 1} - max(di * {m} + ({m - 1} - vec_id)) % {m} AS BIGINT) AS id,
               round(CAST(max(di * {m} + ({m - 1} - vec_id)) // {m} AS DOUBLE)
                     / 1000000.0, 6) AS radius
        FROM mind{r}
    )""")
        prev_ids += f" UNION ALL SELECT id FROM pick{r}"
    selects = ["SELECT CAST(0 AS INT) AS round, CAST(id AS BIGINT) AS center_vec_id, "
               "CAST(0.0 AS DOUBLE) AS radius FROM c0"]
    for r in range(1, _KC_ROUNDS + 1):
        selects.append(
            f"SELECT CAST({r} AS INT) AS round, id AS center_vec_id, radius FROM pick{r}"
        )
    return "WITH " + ",\n    ".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@register("coreset_kcenter_greedy", _kcenter_oracle(), tags=("X-coreset",))
def coreset_kcenter_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985's 2-approximation,
    the coreset rule of Sener & Savarese 2018): seed with the min-id
    vector, then 7 rounds of "add the point farthest from every chosen
    center". The selected radius sequence is the coverage guarantee — 
    every corpus vector is within pick_r's radius of some center after
    round r. Distances are scaled to integer micro-units BEFORE the
    min/argmax so every order-sensitive aggregate is integer arithmetic
    (winning-pattern 11: the pack di * 2^21 + (2^21-1 - vec_id) makes
    "max distance, tie min id" one integer max).

    Distributed shape: per round, one corpus scan with the <= 8-row
    chosen-center frame broadcast, one map-side-combined min per vector,
    one scalar argmax — the driver touches ONE row per round (the BPE
    apply-merges precedent for bounded data-dependent iteration). The
    corpus frame is lazily checkpointed once and reused by all rounds.
    At 100 TB each round is a single narrow pass; k rounds of k-center
    is how facility-location-style data pruning actually runs at scale
    (and the centers double as IVF seeds for ivf_kmeans_cells)."""
    emb = truncate_lineage(
        table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        eager=False,
    )
    seed = emb.agg(F.min("vec_id")).collect()[0][0]
    ids = [seed]
    out = [(0, seed, 0.0)]
    m = _KC_PACK
    d2 = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    for r in range(1, _KC_ROUNDS + 1):
        chosen = emb.filter(F.col("vec_id").isin(ids)).select(F.col("v").alias("cv"))
        di = F.round(d2 * 1000000, 0).cast("long")
        mind = (
            emb.filter(~F.col("vec_id").isin(ids))
            .crossJoin(F.broadcast(chosen))
            .select("vec_id", di.alias("di"))
            .groupBy("vec_id")
            .agg(F.min("di").alias("di"))
        )
        pack = F.max(F.col("di") * m + (F.lit(m - 1) - F.col("vec_id")))
        row = mind.agg(pack.alias("p")).collect()[0]["p"]
        cid = (m - 1) - row % m
        radius = round((row // m) / 1000000.0, 6)
        ids.append(cid)
        out.append((r, cid, radius))
    return spark.createDataFrame(
        out, "round INT, center_vec_id BIGINT, radius DOUBLE"
    )


# ---------------------------------------------------------------------------
# Token burstiness (Church & Gale 1995)
# ---------------------------------------------------------------------------

_BURST_TOPK = 50


@register(
    "token_burstiness_topk",
    f"""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    tf AS (
        SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS doc_freq,
               CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
        FROM tf GROUP BY 1
    ),
    ranked AS (
        SELECT tok, doc_freq, s1, s2,
               ROW_NUMBER() OVER (ORDER BY s1 DESC, tok) AS rn
        FROM stats
    )
    SELECT tok AS token, doc_freq, s1 AS total_tf,
           round(CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE), 5) AS mean_tf,
           round(CAST(n_docs * s2 - s1 * s1 AS DOUBLE)
                 / CAST((n_docs - 1) * s1 AS DOUBLE), 5) AS burstiness
    FROM ranked CROSS JOIN n
    WHERE rn <= {_BURST_TOPK}
    """,
    tags=("X-burstiness",),
)
def token_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness (Church & Gale 1995): the variance-to-mean ratio
    of a token's per-document frequency, with absent documents counted
    as zero occurrences. Poisson (uniformly dispersed function words)
    gives ~1; content words burst — they concentrate in few documents —
    and score far above 1. Corpus curation uses the top-burstiness tail
    to find boilerplate and keyword-stuffed templates that per-doc
    quality scores miss. The whole statistic reduces to integers:
    burstiness = (N*s2 - s1^2) / ((N-1)*s1) where s1 = sum tf and
    s2 = sum tf^2, so the only doubles are two final divisions —
    engine-exact by construction, rounded at the edge.

    Distributed shape: one token explode into a (doc, tok) count (the
    single data-grain shuffle, map-side combined), re-aggregated to
    token grain (Heaps-law small), then a TakeOrderedAndProject top-50
    by total frequency. The zero-inflation is ALGEBRAIC (N rides as a
    broadcast scalar) — no dense doc x token frame ever exists, which
    is what makes the statistic computable at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    stats = tf.groupBy("tok").agg(
        F.count("*").cast("long").alias("doc_freq"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    ranked = stats.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("s1"), "tok"))
    ).filter(F.col("rn") <= _BURST_TOPK)
    return ranked.crossJoin(F.broadcast(n)).select(
        F.col("tok").alias("token"),
        "doc_freq",
        F.col("s1").alias("total_tf"),
        F.round(F.col("s1").cast("double") / F.col("n_docs").cast("double"), 5).alias(
            "mean_tf"
        ),
        F.round(
            (F.col("n_docs") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
            / ((F.col("n_docs") - 1) * F.col("s1")).cast("double"),
            5,
        ).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# Spearman rank agreement between two quality metrics
# ---------------------------------------------------------------------------


@register(
    "quality_metric_spearman",
    """
    WITH m AS (
        SELECT doc_id,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS x,
               CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT) AS y
        FROM documents
    ),
    r AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY x, doc_id) AS BIGINT) AS rx,
               CAST(ROW_NUMBER() OVER (ORDER BY y, doc_id) AS BIGINT) AS ry
        FROM m
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
               CAST(sum(rx * rx) AS BIGINT) AS sxx,
               CAST(sum(ry * ry) AS BIGINT) AS syy,
               CAST(sum(rx * ry) AS BIGINT) AS sxy
        FROM r
    )
    SELECT n AS n_docs,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 5) AS spearman_rho
    FROM s
    """,
    tags=("X-spearman",),
)
def quality_metric_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between two document quality metrics
    (token count vs distinct-token count) — the metric-validation step
    every curation pipeline runs before trusting a cheap score as a
    proxy for an expensive one (quality-classifier vs heuristic
    agreement). Deterministic-rank variant: ties broken by doc_id so
    both rankings are total orders, then Spearman = Pearson on the
    integer ranks. EVERY aggregate is an integer sum (rank products);
    the single rho expression is two exact integer-valued sqrt()s and
    one division — engine-identical, rounded at the edge. Bound:
    n * sum(rx*ry) <= n^4 stays inside int64 to ~55k docs per
    evaluation slice; shard the correlation by stratum beyond that (the
    sums are additive, so sharded moments merge exactly).

    Distributed shape: one scan computing both metrics, two global
    row_number sorts (rank assignment is the unavoidable total-order
    step; at 100 TB both become approx-percentile bucket ranks with the
    identical downstream algebra), one scalar moment aggregation."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    m = docs.select(
        "doc_id",
        F.size(ws).cast("long").alias("x"),
        F.size(F.array_distinct(ws)).cast("long").alias("y"),
    )
    r = m.select(
        F.row_number().over(Window.orderBy("x", "doc_id")).cast("long").alias("rx"),
        F.row_number().over(Window.orderBy("y", "doc_id")).cast("long").alias("ry"),
    )
    s = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return s.select(
        F.col("n").alias("n_docs"), F.round(num / den, 5).alias("spearman_rho")
    )


# ---------------------------------------------------------------------------
# k-core peeling on the near-duplicate candidate graph (Seidman 1983)
# ---------------------------------------------------------------------------

_KCORE_PEELS = 3


def _kcore_oracle() -> str:
    from .training import _BANDS_CTE, _MINHASH_CTE, _PAIRS_CTE, _SHINGLES_CTE

    parts = [
        f"WITH {_SHINGLES_CTE}, {_MINHASH_CTE}, {_BANDS_CTE}, {_PAIRS_CTE}",
        """, n0 AS (
        SELECT DISTINCT u FROM (SELECT doc_id_a AS u FROM pairs
                                UNION ALL SELECT doc_id_b AS u FROM pairs)
    ), e0 AS (SELECT doc_id_a AS a, doc_id_b AS b FROM pairs)""",
    ]
    for r in range(1, _KCORE_PEELS + 1):
        parts.append(f""", d{r} AS (
        SELECT u, count(*) AS c
        FROM (SELECT a AS u FROM e{r - 1} UNION ALL SELECT b AS u FROM e{r - 1})
        GROUP BY 1
    ), e{r} AS (
        SELECT e.a, e.b FROM e{r - 1} e
        JOIN d{r} x ON e.a = x.u AND x.c >= 2
        JOIN d{r} y ON e.b = y.u AND y.c >= 2
    )""")
    parts.append(f"""
    , df AS (
        SELECT u, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT a AS u FROM e{_KCORE_PEELS}
              UNION ALL SELECT b AS u FROM e{_KCORE_PEELS})
        GROUP BY 1
    )
    SELECT n0.u AS doc_id, coalesce(df.c, 0) AS core_degree,
           coalesce(df.c, 0) >= 2 AS in_2core
    FROM n0 LEFT JOIN df ON n0.u = df.u""")
    return "".join(parts)


@register("dedup_kcore_peeling", _kcore_oracle(), tags=("X-kcore",))
def dedup_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the LSH near-duplicate candidate graph by bounded
    degree peeling (Seidman 1983): repeatedly delete degree-<2 nodes;
    what survives is the dense template/boilerplate backbone — the
    subgraph where every doc has 2+ near-dup partners — while chains
    and isolated pairs (benign coincidental matches) peel away. Three
    peel rounds, fixed (the diameter-bounded analog of the LPA /
    pagerank bounded-iteration precedent; in_2core additionally checks
    the survivor's degree so a non-converged boundary node cannot be
    over-claimed). Same shingle/minhash/band parameters as
    dedup_lsh_candidate_pairs, so the oracle shares its CTEs verbatim.

    Distributed shape: the band self-join builds the edge list ONCE
    over a lazily-checkpointed band frame; each peel round is one
    explode-of-array degree count (one map-combined shuffle — NOT a
    two-branch union re-running the parent, winning-pattern 8) plus two
    semi joins against the (tiny, shrinking) active-node set, with the
    edge frame re-checkpointed per round because the next round reads
    it twice (the LPA lineage lesson). At 100 TB the peel is
    degree-bounded work on an edge list that LSH already reduced far
    below corpus scale."""
    from ..operators.dedup import lsh_bands, lsh_candidate_pairs, minhash_signatures

    docs = table(spark, sf_dir, "documents")
    bands = truncate_lineage(
        lsh_bands(minhash_signatures(docs, 4), rows_per_band=2), eager=False
    )
    edges = truncate_lineage(
        lsh_candidate_pairs(docs, k=4, rows_per_band=2, bands=bands).select(
            F.col("doc_id_a").alias("a"), F.col("doc_id_b").alias("b")
        ),
        eager=False,
    )
    ends = F.explode(F.array("a", "b")).alias("u")
    nodes0 = edges.select(ends).distinct()
    for _ in range(_KCORE_PEELS):
        active = (
            edges.select(ends)
            .groupBy("u")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") >= 2)
            .select("u")
        )
        edges = truncate_lineage(
            edges.join(F.broadcast(active.withColumnRenamed("u", "a")), "a")
            .join(F.broadcast(active.withColumnRenamed("u", "b")), "b")
            .select("a", "b"),
            eager=False,
        )
    degf = edges.select(ends).groupBy("u").agg(F.count("*").cast("long").alias("c"))
    return nodes0.join(degf, "u", "left").select(
        F.col("u").alias("doc_id"),
        F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("core_degree"),
        (F.coalesce(F.col("c"), F.lit(0)) >= 2).alias("in_2core"),
    )
