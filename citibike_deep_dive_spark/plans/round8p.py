"""Round-8 continuation batch 14: membership inference, graph core
structure, and spectral outliers — Min-K% Prob membership scoring
(Shi et al. 2023, "Detecting Pretraining Data from Large Language
Models": the mean of a document's k% least-probable tokens under the
reference LM, the statistic that separates seen-in-training from
unseen text better than full-document perplexity because memorization
lifts exactly the improbable tokens), the rich-club coefficient of the
mutual-kNN graph (Zhou & Mondragón 2004 — do high-degree vectors link
to EACH OTHER: the core-structure number assortativity summarizes into
one correlation and k-core truncates into membership), and PCA
reconstruction-error outlier scores (the spectral-outlier member of
the embedding-quality family, built directly on
pca_power_iteration's deterministic top component).

Engine-exactness: per-token log-probabilities are micro-nat integers
with (value, token) tie-broken bottom-k windows; rich-club counts are
pure integer suffix sums over degree thresholds; outlier scores use
the 6dp-ROUNDED published loadings so both engines project through
identical vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table

# ---------------------------------------------------------------------------
# Min-K% Prob membership scoring (Shi et al. 2023)
# ---------------------------------------------------------------------------

_MINK_FRAC_NUM = 1  # k = 20% of the document's tokens
_MINK_FRAC_DEN = 5
_MINK_TOPK = 25  # report the most-suspicious documents


def _mink_oracle() -> str:
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    corpus AS (SELECT tok, CAST(count(*) AS BIGINT) AS ct FROM toks GROUP BY 1),
    scalars AS (
        SELECT CAST(sum(ct) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
        FROM corpus
    ),
    scored AS (  -- micro-nat log-prob per token instance
        SELECT x.doc_id, x.tok,
               CAST(round(1000000.0 * ln((k.ct + 1.0) / (s.t + s.v)))
                    AS BIGINT) AS lp_mu
        FROM toks x JOIN corpus k USING (tok) CROSS JOIN scalars s
    ),
    ranked AS (
        SELECT doc_id, lp_mu,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY lp_mu, tok) AS rn,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM scored
    ),
    mink AS (
        SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
               CAST(greatest(1, (max(n) * {_MINK_FRAC_NUM})
                                // {_MINK_FRAC_DEN}) AS BIGINT) AS k,
               CAST(sum(CASE WHEN rn <= greatest(1, (n * {_MINK_FRAC_NUM})
                                                    // {_MINK_FRAC_DEN})
                        THEN lp_mu ELSE 0 END) AS BIGINT) AS s_mu
        FROM ranked GROUP BY 1
    )
    SELECT doc_id, n_tokens, k,
           round(CAST(s_mu AS DOUBLE) / (1000000.0 * k), 5) AS min_k_logp,
           CAST(row_number() OVER (ORDER BY CAST(s_mu AS DOUBLE) / k DESC, doc_id)
                AS BIGINT) AS rank
    FROM mink
    QUALIFY rank <= {_MINK_TOPK}
    """


@register("min_k_prob_membership", _mink_oracle(), tags=("X-min-k-prob",))
def min_k_prob_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-K% Prob membership score (Shi et al. 2023): per document,
    the mean log-probability of its 20% LEAST-probable tokens under the
    smoothed corpus unigram reference model, reporting the 25 documents
    whose worst tokens are most probable — the membership-inference /
    contamination signal ccnet_perplexity_buckets cannot provide: full-
    document perplexity averages away memorization, which lifts exactly
    the improbable tail (a document whose rarest tokens are all
    well-explained has likely been seen by — or leaked into — the
    reference model). The model-side complement to the data-side
    decontamination queries (n-gram overlap, semantic).

    Per-token log-probs are micro-nat INTEGERS; the bottom-k window
    tie-breaks on (lp, token) and the per-doc mean is an exact integer
    sum over an integer k — the final ranking compares exact ratios
    with a doc_id tiebreak. Distributed shape: one token explode, a
    Heaps-bounded corpus join, a per-document bottom-k rank window
    (document-partitioned, the token-grain shape every tokenizer query
    uses), one doc-grain rollup and a top-25."""
    docs = table(spark, sf_dir, "documents")
    toks = truncate_lineage(
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")),
        eager=False,
    )
    corpus = toks.groupBy("tok").agg(F.count("*").cast("long").alias("ct"))
    scalars = corpus.agg(
        F.sum("ct").cast("long").alias("t"), F.count("*").cast("long").alias("v")
    )
    scored = (
        toks.join(corpus, "tok")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            "tok",
            F.round(
                1000000.0 * F.log((F.col("ct") + 1.0) / (F.col("t") + F.col("v"))),
                0,
            )
            .cast("long")
            .alias("lp_mu"),
        )
    )
    wd = Window.partitionBy("doc_id")
    ranked = scored.select(
        "doc_id",
        "lp_mu",
        F.row_number().over(wd.orderBy("lp_mu", "tok")).alias("rn"),
        F.count("*").over(
            wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    kcol = F.greatest(
        F.lit(1), (F.col("n") * _MINK_FRAC_NUM).cast("long") / _MINK_FRAC_DEN
    ).cast("long")
    mink = ranked.groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.max(kcol).cast("long").alias("k"),
        F.sum(F.when(F.col("rn") <= kcol, F.col("lp_mu")).otherwise(0))
        .cast("long")
        .alias("s_mu"),
    )
    # r14 checkpoint audit: mink feeds ONE global rank — the checkpoint
    # paid a doc-grain write+read inside every single execution and only
    # subsidized warm re-runs of the same df. Dropped.
    return (
        mink.withColumn(
            "rank",
            F.row_number()
            .over(
                Window.orderBy(
                    F.desc(F.col("s_mu").cast("double") / F.col("k")), "doc_id"
                )
            )
            .cast("long"),
        )
        .filter(F.col("rank") <= _MINK_TOPK)
        .select(
            "doc_id",
            "n_tokens",
            "k",
            F.round(F.col("s_mu").cast("double") / (1000000.0 * F.col("k")), 5).alias(
                "min_k_logp"
            ),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Rich-club coefficient of the mutual-kNN graph (Zhou & Mondragón 2004)
# ---------------------------------------------------------------------------


def _rich_club_oracle() -> str:
    from .training import _cos_sql

    cos = _cos_sql("a.embedding", "b.embedding")
    return f"""
    WITH scored AS (
        SELECT a.label, a.vec_id AS src, b.vec_id AS dst, {cos} AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    knn AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY src
                                         ORDER BY cos_sim DESC, dst) AS rn
            FROM scored
        ) WHERE rn <= 5
    ),
    pairs AS (
        SELECT f.src AS a, f.dst AS b
        FROM knn f JOIN knn r ON f.src = r.dst AND f.dst = r.src
        WHERE f.src < f.dst
    ),
    sym AS (SELECT a AS s, b AS d FROM pairs UNION ALL SELECT b, a FROM pairs),
    deg AS (SELECT s AS id, CAST(count(*) AS BIGINT) AS dg FROM sym GROUP BY 1),
    kgrid AS (
        SELECT unnest(generate_series(1, (SELECT max(dg) - 1 FROM deg))) AS k
    ),
    nodes_k AS (
        SELECT g.k, CAST(count(*) AS BIGINT) AS n_k
        FROM kgrid g JOIN deg ON deg.dg > g.k GROUP BY 1
    ),
    edges_k AS (
        SELECT g.k, CAST(count(*) AS BIGINT) AS e_k
        FROM kgrid g
        JOIN (SELECT p.a, p.b, da.dg AS dga, db.dg AS dgb
              FROM pairs p JOIN deg da ON p.a = da.id
              JOIN deg db ON p.b = db.id) e
          ON least(e.dga, e.dgb) > g.k
        GROUP BY 1
    )
    SELECT n.k, n.n_k AS n_nodes, coalesce(e.e_k, 0) AS n_edges,
           round(2.0 * coalesce(e.e_k, 0) / (n.n_k * (n.n_k - 1)), 6) AS phi
    FROM nodes_k n LEFT JOIN edges_k e USING (k)
    WHERE n.n_k >= 2
    """


@register("rich_club_coefficient", _rich_club_oracle(), tags=("X-rich-club",))
def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient (Zhou & Mondragón 2004) of the mutual-kNN
    embedding graph: for each degree threshold k, the edge density
    phi(k) = 2 E_k / (N_k (N_k - 1)) among nodes of degree > k —
    whether the best-connected vectors form a CLUB. The third
    core-structure lens: assortativity gives one mixing correlation,
    k-core gives membership in the maximal dense subgraph, the
    rich-club CURVE shows at which degree the density takes off (a
    rising phi means hub near-duplicates interlink — the clique-like
    cores LSH banding will hash into the same buckets). Degrees are
    2k-bounded by the mutual-kNN construction, so the threshold grid
    is tiny everywhere.

    Pure integer counting: the degree histogram and per-threshold
    node/edge counts are exact, with one rounded density ratio.
    Distributed shape: the cell-restricted mutual-kNN edge build, a
    degree aggregation, one degree-threshold grid join against the
    k-bounded edge frame — metadata-scale after the edge build."""
    from .round6 import mutual_knn_pairs

    pairs = truncate_lineage(
        mutual_knn_pairs(spark, sf_dir).select(
            F.col("id_a").alias("a"), F.col("id_b").alias("b")
        ),
        eager=False,
    )  # sym degrees + the threshold join both read it
    sym = pairs.select(F.col("a").alias("s")).unionAll(
        pairs.select(F.col("b").alias("s"))
    )
    deg = sym.groupBy("s").agg(F.count("*").cast("long").alias("dg"))
    deg = truncate_lineage(deg, eager=False)  # grid max, nodes_k, edge join
    maxd = deg.agg((F.max("dg") - 1).cast("int").alias("m"))
    kgrid = (
        spark.range(1, 64)
        .select(F.col("id").cast("int").alias("k"))
        .join(F.broadcast(maxd), F.col("k") <= F.col("m"))
        .select("k")
    )
    nodes_k = (
        kgrid.join(F.broadcast(deg), F.col("dg") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n_k"))
    )
    edges = (
        pairs.join(
            F.broadcast(deg.select(F.col("s").alias("a"), F.col("dg").alias("dga"))),
            "a",
        )
        .join(
            F.broadcast(deg.select(F.col("s").alias("b"), F.col("dg").alias("dgb"))),
            "b",
        )
        .select(F.least("dga", "dgb").alias("mindg"))
    )
    edges_k = (
        kgrid.join(F.broadcast(edges), F.col("mindg") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("e_k"))
    )
    return (
        nodes_k.join(edges_k, "k", "left")
        .filter(F.col("n_k") >= 2)
        .select(
            "k",
            F.col("n_k").alias("n_nodes"),
            F.coalesce(F.col("e_k"), F.lit(0)).cast("long").alias("n_edges"),
            F.round(
                2.0
                * F.coalesce(F.col("e_k"), F.lit(0))
                / (F.col("n_k") * (F.col("n_k") - 1)),
                6,
            ).alias("phi"),
        )
    )


# ---------------------------------------------------------------------------
# PCA reconstruction-error outlier scores
# ---------------------------------------------------------------------------

_PCA_OUT_TOPK = 20


def _pca_outlier_oracle() -> str:
    from .round8b import _PCA_D, _PCA_Q

    # re-derive the identical component via the registered oracle text
    from .catalog import CATALOG as _CAT

    pca_sql = _CAT["pca_power_iteration"].oracle
    return f"""
    WITH pca AS (SELECT * FROM ({pca_sql}) p),
    q AS (
        SELECT vec_id, g.i - 1 AS i,
               CAST(round(CAST(embedding[g.i] AS DOUBLE) * {_PCA_Q}, 0)
                    AS BIGINT) AS q
        FROM embeddings, generate_series(1, {_PCA_D}) g(i)
    ),
    mu AS (
        SELECT i, CAST(sum(q) AS DOUBLE) / (count(*) * {float(_PCA_Q)}) AS m
        FROM q GROUP BY 1
    ),
    cent AS (
        SELECT e.vec_id, e.label, g.i - 1 AS i,
               CAST(e.embedding[g.i] AS DOUBLE) - mu.m AS c
        FROM embeddings e
        CROSS JOIN generate_series(1, {_PCA_D}) g(i)
        JOIN mu ON mu.i = g.i - 1
    ),
    scored AS (
        SELECT c.vec_id, CAST(max(c.label) AS INTEGER) AS label,
               CAST(round(1000000.0 * (sum(c.c * c.c)
                    - sum(c.c * p.loading) * sum(c.c * p.loading)))
                    AS BIGINT) AS score_mu
        FROM cent c JOIN pca p ON p.dim = c.i
        GROUP BY 1
    )
    SELECT vec_id, label,
           round(score_mu / 1000000.0, 5) AS residual_var,
           CAST(row_number() OVER (ORDER BY score_mu DESC, vec_id) AS BIGINT)
               AS rank
    FROM scored
    QUALIFY rank <= {_PCA_OUT_TOPK}
    """


@register("pca_outlier_scores", _pca_outlier_oracle(), tags=("X-pca-outliers",))
def pca_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-variance outliers along the top principal component:
    for each embedding, score = ||x - mu||^2 - ((x - mu) . v)^2 over
    the first 16 dims — the energy the top component CANNOT explain.
    Reports the top-20 highest-residual vectors: the spectral-outlier
    member of the embedding-quality family (hubness finds over-popular
    vectors, label-error candidates find neighborhood disagreement;
    this finds vectors pointing AWAY from the dominant variance
    direction — encoder glitches and off-distribution content).

    v is pca_power_iteration's published 6dp-ROUNDED loading vector
    and mu the exact quantized column means, so both engines project
    through identical numbers; per-vector scores round to micro-units
    before the (score, vec_id) ranking. Distributed shape: the PCA
    moment pass (one aggregation), then one linear scan computing two
    16-term dot products per vector — no pairwise anything, top-20 via
    TakeOrderedAndProject."""
    from .round8b import _PCA_D, _PCA_Q, pca_power_iteration

    emb = table(spark, sf_dir, "embeddings")
    comp = pca_power_iteration(spark, sf_dir)  # (dim, loading, eigenvalue)
    vvec = F.broadcast(
        comp.groupBy().agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("loading")))
            ).alias("vl")
        ).select(F.transform("vl", lambda s: s.getField("loading")).alias("v"))
    )
    # exact per-dim means from the quantized column sums (matches the
    # PCA oracle's centering)
    qa = F.transform(
        F.slice("embedding", 1, _PCA_D),
        lambda x: F.round(x.cast("double") * _PCA_Q, 0).cast("long"),
    )
    sums = (
        emb.select(F.posexplode(qa).alias("i", "q"))
        .groupBy("i")
        .agg(
            F.sum("q").cast("long").alias("sx"),
            F.count("*").cast("long").alias("n"),
        )
    )
    mu = F.broadcast(
        sums.groupBy().agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("i"),
                        (F.col("sx").cast("double") / (F.col("n") * _PCA_Q)).alias(
                            "m"
                        ),
                    )
                )
            ).alias("ml")
        ).select(F.transform("ml", lambda s: s.getField("m")).alias("mu"))
    )
    x16 = F.transform(F.slice("embedding", 1, _PCA_D), lambda c: c.cast("double"))
    centered = F.zip_with(x16, F.col("mu"), lambda a, b: a - b)
    dot_vc = F.aggregate(
        F.zip_with(F.col("cvec"), F.col("v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm2 = F.aggregate(
        F.transform(F.col("cvec"), lambda a: a * a),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scoredf = (
        emb.crossJoin(mu)
        .crossJoin(vvec)
        .select(
            "vec_id",
            "label",
            centered.alias("cvec"),
            F.col("v"),
        )
        .select(
            "vec_id",
            "label",
            F.round(1000000.0 * (norm2 - dot_vc * dot_vc), 0)
            .cast("long")
            .alias("score_mu"),
        )
    )
    return (
        scoredf.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("score_mu"), "vec_id"))
            .cast("long"),
        )
        .filter(F.col("rank") <= _PCA_OUT_TOPK)
        .select(
            "vec_id",
            "label",
            F.round(F.col("score_mu") / 1000000.0, 5).alias("residual_var"),
            "rank",
        )
    )
