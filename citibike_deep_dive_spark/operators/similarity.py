"""Similarity search over embedding columns (array<float>).

Beyond-reference surface (BASELINE.json north star): brute-force cosine
top-k as the exact baseline, and an IVF-style cell-restricted variant as
the scale path.

All vector math is native higher-order functions (zip_with + aggregate)
on array<double> — JVM-side, no Python in the hot path.

Scale notes (billions of vectors):
- brute force is one broadcast (queries) + one scan + one top-k shuffle
  keyed by query id. Exact, O(N·Q) — right for small Q or as rerank.
- IVF: vectors are pre-assigned to cells (here the ``label`` column; in a
  full system, nearest-centroid assignment at ingest). Search touches
  only the probed cell(s): with the table partitioned/bucketed by cell,
  partition pruning skips everything else — the classic
  inverted-file-index trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .fanout import fan_out


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(
    df: DataFrame, col: str = "embedding", fan: bool = True
) -> DataFrame:
    # fan=False for aggregation-first consumers (k-means, IVF assign):
    # they recover parallelism at their first exchange, so the fan-out
    # repartition is pure cost there (r8 site-level A/B, SCALE.md);
    # default True protects the heavy per-row scorers (near-dup pairs).
    out = fan_out(df) if fan else df
    return out.withColumn(col, F.col(col).cast("array<double>"))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is small → broadcast; the corpus is scanned once. Rounded
    similarity + id tiebreak keeps ranking deterministic across engines.
    """
    # Corpus-side norm once per ROW (not per (row, query) pair) — exact:
    # _norm yields identical bits wherever evaluated, so dot/(nc*nq) is
    # the same double the fused cosine() produced.
    corpus = _as_double(embeddings).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cand_vec"),
        _norm(F.col("embedding")).alias("cand_norm"),
    )
    qs = _as_double(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        _norm(F.col("embedding")).alias("query_norm"),
    )
    cos = _dot(F.col("cand_vec"), F.col("query_vec")) / (
        F.col("cand_norm") * F.col("query_norm")
    )
    scored = (
        corpus.join(F.broadcast(qs), F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", F.round(cos, 4).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """IVF-style ANN: each query searches only its own cell (``label``).

    With the corpus bucketed by cell, this prunes (cells-1)/cells of the
    scan; the join key (label) co-locates candidates with queries.
    """
    corpus = _as_double(embeddings).select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("cand_vec"),
    )
    qs = _as_double(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = corpus.withColumn("cand_norm", _norm(F.col("cand_vec")))
    qs = qs.withColumn("query_norm", _norm(F.col("query_vec")))
    cos = _dot(F.col("cand_vec"), F.col("query_vec")) / (
        F.col("cand_norm") * F.col("query_norm")
    )
    scored = (
        corpus.join(F.broadcast(qs), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", F.round(cos, 4).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_cosine_near_dups(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, cell-bucketed (label) so the
    pair join never goes quadratic across the whole corpus.

    Norms are computed ONCE PER ROW before the pair join, not per pair:
    ``_norm(v)`` yields bit-identical doubles wherever evaluated, so
    ``dot/(na*nb)`` is the exact expression the per-pair form computed —
    but 2/3 of the per-pair array traversals disappear (a pair cost of
    3 HOF folds drops to 1). Same rounding, same oracle hash."""
    e = _as_double(embeddings)
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("va"),
        _norm(F.col("embedding")).alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("vb"),
        _norm(F.col("embedding")).alias("nb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def sign_lsh_bucket(vec: Column, bits: int = 16) -> Column:
    """Random-hyperplane LSH bucket for cosine similarity, using the first
    ``bits`` axis-aligned hyperplanes (sign of each leading component).

    Vectors with high cosine similarity agree on most component signs, so
    near-duplicates land in the same bucket with high probability. Pure
    column arithmetic — portable to any SQL engine — and a uniform join
    key at 100 TB (no label/cell metadata needed, unlike the IVF variant).
    """
    total = F.lit(0).cast("long")
    for j in range(bits):  # static unroll — stays in whole-stage codegen
        total = total + F.when(
            F.element_at(vec, j + 1) > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return total


def embedding_near_dups_sign_lsh(
    embeddings: DataFrame, threshold: float = 0.8, bits: int = 16
) -> DataFrame:
    """Near-duplicate pairs via sign-LSH bucketing: candidates must share
    the full sign bucket, then exact cosine verifies. The bucket equi-join
    replaces the quadratic all-pairs comparison — the metadata-free scale
    path for embedding dedup."""
    e = _as_double(embeddings).withColumn(
        "bucket", sign_lsh_bucket(F.col("embedding"), bits)
    )
    a = e.select(F.col("vec_id").alias("id_a"), "bucket", F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), "bucket", F.col("embedding").alias("vb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "bucket",
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    fan: bool = True,
) -> DataFrame:
    """Deterministic mini k-means over the embedding column: centroids
    seeded from the k lowest ids, ``iters`` rounds of assign→mean.

    The iterative driver loop is how Spark expresses fixed-point
    algorithms (same shape as connected_components): each round is one
    broadcast join (assignment — centroids are tiny) + one aggregation
    (new means). Used to build REAL IVF cells instead of relying on a
    label column; at 100 TB you run this on a sample, then one final
    assignment pass over the corpus.

    Returns (cluster_id, centroid: array<double>, n_members).
    """
    e = _as_double(embeddings, fan=fan).select(
        F.col(id_col).alias("__id"), F.col("embedding").alias("v")
    )
    centroids = (
        e.orderBy("__id")
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy("__id"))
            .cast("int")
            .alias("cluster_id"),
            F.col("v").alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = _assign(e, centroids)
        # New means via posexplode → per-(cluster, dim) avg: per-group state
        # is bounded by the embedding dimension, never by cluster size —
        # collect_list of whole vectors would OOM on a skewed cell at scale.
        counts = assigned.groupBy("cluster_id").agg(
            F.count("*").alias("n_members")
        )
        centroids = (
            assigned.select(
                "cluster_id", F.posexplode("v").alias("pos", "val")
            )
            .groupBy("cluster_id", "pos")
            # Decimal-exact mean: double sums are summation-order-
            # dependent (parallel partial aggregates), so cross-engine /
            # cross-run centroid bits would drift and borderline
            # assignments flip. Exact decimal addition + one double
            # division is order-independent — it makes the whole
            # iterative algorithm SQL-replicable (see the
            # ivf_kmeans_cells oracle) and run-deterministic.
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(30,10)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .join(counts, "cluster_id")
            .select("cluster_id", "n_members", "centroid")
        )
        # k tiny rows, but the *plan* compounds per iteration without
        # truncation (r3 audit: 37 exchanges at 3 iters) — checkpoint
        # keeps each round's plan one assign+agg deep.
        centroids = truncate_lineage(centroids)
    return centroids


def _assign(e: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (squared L2; rounded + id tiebreak for
    engine-stable argmin)."""
    dist2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = e.crossJoin(F.broadcast(centroids.select("cluster_id", "centroid"))).select(
        "__id", "v", "cluster_id", F.round(dist2, 6).alias("d2")
    )
    w = Window.partitionBy("__id").orderBy("d2", "cluster_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("__id", "v", "cluster_id")
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    fan: bool = True,
) -> DataFrame:
    """Final IVF cell assignment: (id, cell) for every vector."""
    e = _as_double(embeddings, fan=fan).select(
        F.col(id_col).alias("__id"), F.col("embedding").alias("v")
    )
    return _assign(e, centroids).select(
        F.col("__id").alias(id_col), F.col("cluster_id").alias("cell")
    )


def dim_covariance(embeddings: DataFrame, d: int = 16) -> DataFrame:
    """Covariance matrix of the first ``d`` embedding dimensions.

    The distributed-linear-algebra prep step for PCA / whitening. Two-pass
    *centered* form: pass 1 computes the d per-dim means (one narrow scan,
    shuffle bounded by d); pass 2 emits d(d+1)/2 (i, j, xi, xj) structs
    per row, broadcast-joins the tiny means table twice, and averages
    (x_i − μ_i)(x_j − μ_j) with map-side partial aggregation. Centering
    first avoids the catastrophic cancellation of the one-pass
    E[xy] − E[x]E[y] identity, whose float error exceeds the rounding
    resolution and flips digits between engines (r3 hash mismatch).
    Shuffle volume is bounded by partitions × d², never by row count; no
    driver-side matrix.
    """
    e = F.transform(F.slice("embedding", 1, d), lambda x: x.cast("double"))
    src = embeddings.select(e.alias("xs"))
    means = (
        src.select(F.posexplode("xs").alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("mu"))
    )

    def pair_row(i: Column) -> Column:
        xi = F.element_at("xs", (i + 1).cast("int"))

        def inner(j: Column) -> Column:
            xj = F.element_at("xs", (j + 1).cast("int"))
            return F.struct(
                i.cast("int").alias("i"),
                j.cast("int").alias("j"),
                xi.alias("xi"),
                xj.alias("xj"),
            )

        return F.transform(F.sequence(i, F.lit(d - 1)), inner)

    pairs = F.flatten(F.transform(F.sequence(F.lit(0), F.lit(d - 1)), pair_row))
    return (
        src.select(F.explode(pairs).alias("p"))
        .select("p.i", "p.j", "p.xi", "p.xj")
        .join(F.broadcast(means.select("i", F.col("mu").alias("mu_i"))), "i")
        .join(
            F.broadcast(means.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))),
            "j",
        )
        .groupBy("i", "j")
        .agg(
            (
                F.round(F.avg((F.col("xi") - F.col("mu_i")) * (F.col("xj") - F.col("mu_j"))), 4)
                + F.lit(0.0)
            ).alias("cov")
        )
        .select("i", "j", "cov")
    )


def matryoshka_renormalize(embeddings: DataFrame, k: int = 16) -> DataFrame:
    """Truncate each embedding to its first ``k`` dims and L2-renormalize
    (matryoshka-representation serving: shorter prefixes as cheaper
    vectors). Pure per-row array math — no shuffle at any scale."""
    e = F.transform(F.slice("embedding", 1, k), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return fan_out(embeddings).select(
        "vec_id",
        F.round(norm, 5).alias("norm_k"),
        F.transform(e, lambda x: F.round(x / norm, 5)).alias("renorm"),
    )


def int8_quantize(emb: DataFrame, levels: int = 255) -> DataFrame:
    """Per-vector scalar int8 quantization (min/max affine) — the serving
    compression pass that shrinks an embedding store 4× before ANN.

    Emits the quant params (lo, scale), the quantized codes, and the max
    absolute reconstruction error per vector. Pure per-row array math:
    zero shuffle, whole-stage codegen, scales linearly at any corpus
    size. Rounding is the engine-portable ``floor(x + 0.5)`` so Spark
    and the DuckDB oracle agree exactly (Spark's double→int CAST
    truncates while DuckDB's rounds — never CAST a non-integral).
    fan_out: the transforms are interpreted HOFs, and a single-file
    embedding store otherwise quantizes on one core (measured 1.39 s →
    0.4 s at sf0.1); no-op on well-split inputs.
    """
    emb = fan_out(emb)
    xs = emb.select(
        "vec_id",
        F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("xs"),
    ).select(
        "vec_id",
        "xs",
        F.array_min("xs").alias("lo"),
        ((F.array_max("xs") - F.array_min("xs")) / float(levels)).alias("scale"),
    )
    qvals = F.expr(
        "CASE WHEN scale > 0 THEN "
        "transform(xs, v -> CAST(floor((v - lo) / scale + 0.5D) AS INT)) "
        "ELSE transform(xs, v -> 0) END"
    )
    err = F.expr(
        "CASE WHEN scale > 0 THEN "
        "round(array_max(transform(xs, v -> "
        "abs(lo + CAST(floor((v - lo) / scale + 0.5D) AS INT) * scale - v))), 5) "
        "ELSE 0.0D END"
    )
    return xs.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.round("lo", 6).alias("lo"),
        qvals.alias("qvals"),
        err.alias("max_abs_err"),
    )


def sign_projection_sketch(emb: DataFrame, k: int = 8, d: int = 64) -> DataFrame:
    """Johnson-Lindenstrauss sign-random-projection sketch: project each
    ``d``-dim embedding to ``k`` dims against a deterministic ±1 matrix
    derived from an LCG on (j, k) — no stored projection matrix, any
    executor regenerates it, so the op broadcasts nothing at 100 TB.

    Per-row fold over the array (no shuffle). The (j,k) hash is BIGINT
    arithmetic on both engines (int32 would overflow at j*1103515245).
    """
    proj = F.expr(
        f"transform(sequence(0, {k - 1}), k -> round("
        f"aggregate(sequence(1, {d}), 0D, (acc, j) -> "
        "acc + CAST(element_at(embedding, j) AS DOUBLE) * "
        "(CASE WHEN (CAST(j AS BIGINT) * 1103515245 + k * 12345) % 65536 < 32768 "
        f"THEN 1.0D ELSE -1.0D END)) / sqrt(CAST({d} AS DOUBLE)), 5))"
    )
    return emb.select("vec_id", proj.alias("sketch"))
