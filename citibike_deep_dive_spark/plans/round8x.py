"""Round-8 continuation batch 22: density-based outliers — the Local
Outlier Factor (Breunig et al. 2000) over the in-cell embedding kNN
graph. The fourth and final member of the embedding-outlier family,
each catching what the others cannot: pca_outlier_scores is GLOBAL
(far from the dominant variance direction), knn_label_error_candidates
needs labels, embedding_hubness_koccurrence flags over-popularity —
LOF is local and label-free: a point in a sparse region NEXT TO a
dense cluster scores high even when its global coordinates look
ordinary, which is exactly the "lone paraphrase near a boilerplate
cluster" shape embedding dedup mishandles.

Engine-exactness: distances are 4dp-rounded cosine distances, so
k-distances and reachability distances are EXACT multiples of 1e-4
(max of two 4dp values) and per-point reachability sums are exact
integers in 1e-4 units; lrd rounds at 6dp before the LOF ratio and the
ranking orders by the rounded LOF with a vec_id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table

_LOF_K = 5
_LOF_TOPK = 20


def _lof_oracle() -> str:
    from .training import _cos_sql, _kmeans_cte

    cos = _cos_sql("ea.embedding", "eb.embedding")
    return (
        _kmeans_cte(8, 3)
        + f""",
    assigned AS (
        SELECT b.vec_id, b.label, b.embedding, f.cell
        FROM embeddings b JOIN final f ON b.vec_id = f.id
    ),
    dists AS (
        SELECT ea.vec_id AS a, eb.vec_id AS b, ea.label, ea.cell,
               round(1.0 - {cos}, 4) AS d
        FROM assigned ea JOIN assigned eb
          ON ea.cell = eb.cell AND ea.vec_id <> eb.vec_id
    ),
    knn AS (
        SELECT * FROM (
            SELECT a, b, label, cell, d,
                   row_number() OVER (PARTITION BY a ORDER BY d, b) AS rn
            FROM dists
        ) WHERE rn <= {_LOF_K}
    ),
    kdist AS (
        SELECT a AS v, CAST(max(round(d * 10000)) AS BIGINT) AS kd_mu,
               CAST(count(*) AS BIGINT) AS k_eff
        FROM knn GROUP BY 1
    ),
    reach AS (  -- reach(a,b) = max(d(a,b), kdist(b)), exact 1e-4 units
        SELECT k.a, k.b, k.label, k.cell,
               greatest(CAST(round(k.d * 10000) AS BIGINT), kb.kd_mu) AS r_mu
        FROM knn k JOIN kdist kb ON k.b = kb.v
    ),
    lrd AS (
        SELECT r.a AS v, CAST(max(r.label) AS INTEGER) AS label,
               CAST(max(r.cell) AS BIGINT) AS cell,
               CAST(count(*) AS BIGINT) AS k_eff,
               CAST(sum(r.r_mu) AS BIGINT) AS sum_mu,
               round(count(*) * 10000.0 / sum(r.r_mu), 6) AS lrd_r
        FROM reach r GROUP BY 1
    ),
    lof AS (
        SELECT k.a AS v, CAST(max(l.label) AS INTEGER) AS label,
               CAST(max(l.cell) AS BIGINT) AS cell,
               max(l.lrd_r) AS lrd_a,
               round(sum(lb.lrd_r) / count(*) / max(l.lrd_r), 4) AS lof
        FROM knn k
        JOIN lrd l ON l.v = k.a
        JOIN lrd lb ON lb.v = k.b
        GROUP BY 1
    )
    SELECT v AS vec_id, label, cell,
           round(lrd_a, 6) AS lrd, lof,
           CAST(row_number() OVER (ORDER BY lof DESC, v) AS BIGINT) AS rank
    FROM lof
    QUALIFY rank <= {_LOF_TOPK}
    """
    )


@register("lof_embedding_outliers", _lof_oracle(), tags=("X-lof",))
def lof_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Outlier Factor (Breunig et al. 2000, k = 5) over the
    in-cell embedding kNN graph: reachability distances smooth the
    metric inside clusters, local reachability density compares each
    point to its own neighborhood, and LOF >> 1 marks points whose
    neighborhood is much denser than they are — the LOCAL, label-free
    outlier lens completing the quartet (PCA residual = global
    geometry, label-error consensus = needs labels, hubness =
    popularity; LOF catches the lone point beside a dense paraphrase
    cluster that all three score as normal). Top-20 by LOF.

    Cosine distances round at 4dp, so every k-distance and
    reachability distance is an exact integer in 1e-4 units and the
    per-point reachability sums are exact; lrd rounds at 6dp before
    the LOF ratio, and the final ranking uses the rounded LOF with a
    vec_id tiebreak — the kmeans-argmin determinism discipline end to
    end. Distributed shape: the k-means loop, one in-cell pair scan
    (quadratic within a cell; cells ∝ corpus at true scale), a
    per-point top-k window, then everything on the k-bounded
    neighbor frame: one kdist join, two lrd joins, one rollup."""
    from ..operators.similarity import _dot, _norm, kmeans

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    e = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    cent = kmeans(emb, k=8, iters=3, fan=False).select(
        "cluster_id", F.col("centroid").alias("m")
    )
    d2raw = F.aggregate(
        F.zip_with("v", "m", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assign = (
        e.crossJoin(F.broadcast(cent))
        .select("id", "cluster_id", F.round(d2raw, 6).alias("r6"))
        .groupBy("id")
        .agg(F.min(F.struct(F.col("r6"), F.col("cluster_id"))).alias("ms"))
        .select("id", F.col("ms.cluster_id").alias("cell"))
    )
    assigned = truncate_lineage(
        emb.join(assign, emb.vec_id == assign.id).select(
            "vec_id", "label", "embedding", "cell", _norm(F.col("embedding")).alias("nrm")
        ),
        eager=False,
    )  # both sides of the pair scan read it
    a, b = assigned.alias("a"), assigned.alias("b")
    dist = F.round(
        1.0
        - _dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        4,
    )
    knn = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.col("a.label").alias("label"),
            F.col("a.cell").alias("cell"),
            dist.alias("d"),
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("va").orderBy("d", "vb")),
        )
        .filter(F.col("rn") <= _LOF_K)
    )
    # k-bounded checkpoint: the interpreted-HOF pair scan runs once
    knn = truncate_lineage(knn, eager=False)
    d_mu = F.round(F.col("d") * 10000, 0).cast("long")
    kdist = knn.groupBy(F.col("va").alias("v")).agg(
        F.max(d_mu).cast("long").alias("kd_mu")
    )
    reach = knn.join(
        F.broadcast(kdist.select(F.col("v").alias("vb"), "kd_mu")), "vb"
    ).select(
        "va",
        "vb",
        "label",
        "cell",
        F.greatest(d_mu, F.col("kd_mu")).alias("r_mu"),
    )
    lrd = reach.groupBy(F.col("va").alias("v")).agg(
        F.max("label").cast("int").alias("label"),
        F.max("cell").cast("long").alias("cell"),
        F.round(F.count("*") * 10000.0 / F.sum("r_mu"), 6).alias("lrd_r"),
    )
    lrd = truncate_lineage(lrd, eager=False)  # joined twice into the LOF rollup
    lof = (
        knn.select("va", "vb")
        .join(F.broadcast(lrd.select(F.col("v").alias("va"), F.col("lrd_r").alias("lrd_a"), "label", "cell")), "va")
        .join(
            F.broadcast(lrd.select(F.col("v").alias("vb"), F.col("lrd_r").alias("lrd_b"))),
            "vb",
        )
        .groupBy("va")
        .agg(
            F.max("label").cast("int").alias("label"),
            F.max("cell").cast("long").alias("cell"),
            F.max("lrd_a").alias("lrd_a"),
            F.round(F.sum("lrd_b") / F.count("*") / F.max("lrd_a"), 4).alias("lof"),
        )
    )
    return (
        lof.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("lof"), "va")).cast("long"),
        )
        .filter(F.col("rank") <= _LOF_TOPK)
        .select(
            F.col("va").alias("vec_id"),
            "label",
            "cell",
            F.round(F.col("lrd_a"), 6).alias("lrd"),
            "lof",
            "rank",
        )
    )
