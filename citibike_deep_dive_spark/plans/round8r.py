"""Round-8 continuation batch 16: entropic optimal transport and
empirical-Bayes shrinkage — a two-round Sinkhorn-Knopp transport plan
(Cuturi 2013) between two sources' document-length distributions (the
PLAN the Wasserstein distance only prices: which mass moves WHERE —
what a length-matching resampler would actually execute), and
beta-binomial shrinkage of per-source English rates (Morris 1983
empirical Bayes / James-Stein idea: small sources borrow strength from
the corpus — the rate estimator a mixture dashboard should display
instead of raw proportions).

Engine-exactness: Sinkhorn scaling vectors are re-quantized to
nano-unit integers after every half-step (the raking/IPF discipline on
an exp kernel), so both engines iterate identical values; shrinkage
hyper-parameters derive from exact integer counts through one rounded
method-of-moments edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table

# ---------------------------------------------------------------------------
# Sinkhorn-Knopp entropic transport plan (Cuturi 2013)
# ---------------------------------------------------------------------------

_SK_A = "src0"
_SK_B = "src1"
_SK_EPS = 50.0  # entropic regularizer in n_chars units
_SK_TOPK = 50


def _sinkhorn_oracle() -> str:
    return f"""
    WITH da AS (
        SELECT n_chars AS x, CAST(count(*) AS BIGINT) AS ca
        FROM documents WHERE source = '{_SK_A}' GROUP BY 1
    ),
    db AS (
        SELECT n_chars AS y, CAST(count(*) AS BIGINT) AS cb
        FROM documents WHERE source = '{_SK_B}' GROUP BY 1
    ),
    na AS (SELECT CAST(sum(ca) AS BIGINT) AS n0 FROM da),
    nb AS (SELECT CAST(sum(cb) AS BIGINT) AS n1 FROM db),
    kmat AS (
        SELECT da.x, db.y, da.ca, db.cb,
               CAST(abs(da.x - db.y) AS BIGINT) AS cost,
               exp(-abs(da.x - db.y) / {_SK_EPS}) AS kk
        FROM da CROSS JOIN db
    ),
    d1 AS (  -- column sums with u0 = 1, nano-quantized terms
        SELECT y, CAST(sum(CAST(round(1000000000.0 * kk) AS BIGINT)) AS BIGINT)
                   AS d
        FROM kmat GROUP BY 1
    ),
    v1 AS (
        SELECT d1.y, CAST(round(db.cb * 1e18 / (nb.n1 * CAST(d1.d AS DOUBLE)))
                          AS BIGINT) AS v_mu
        FROM d1 JOIN db USING (y) CROSS JOIN nb
    ),
    s1 AS (
        SELECT k.x, CAST(sum(CAST(round(k.kk * v1.v_mu) AS BIGINT)) AS BIGINT)
                   AS s
        FROM kmat k JOIN v1 USING (y) GROUP BY 1
    ),
    u1 AS (
        SELECT s1.x, CAST(round(da.ca * 1e18 / (na.n0 * CAST(s1.s AS DOUBLE)))
                          AS BIGINT) AS u_mu
        FROM s1 JOIN da USING (x) CROSS JOIN na
    ),
    d2 AS (
        SELECT k.y, CAST(sum(CAST(round(k.kk * u1.u_mu) AS BIGINT)) AS BIGINT)
                   AS d
        FROM kmat k JOIN u1 USING (x) GROUP BY 1
    ),
    v2 AS (
        SELECT d2.y, CAST(round(db.cb * 1e18 / (nb.n1 * CAST(d2.d AS DOUBLE)))
                          AS BIGINT) AS v_mu
        FROM d2 JOIN db USING (y) CROSS JOIN nb
    ),
    s2 AS (
        SELECT k.x, CAST(sum(CAST(round(k.kk * v2.v_mu) AS BIGINT)) AS BIGINT)
                   AS s
        FROM kmat k JOIN v2 USING (y) GROUP BY 1
    ),
    u2 AS (
        SELECT s2.x, CAST(round(da.ca * 1e18 / (na.n0 * CAST(s2.s AS DOUBLE)))
                          AS BIGINT) AS u_mu
        FROM s2 JOIN da USING (x) CROSS JOIN na
    ),
    plan AS (  -- P = diag(u) K diag(v), nano mass units
        SELECT k.x, k.y, k.cost,
               CAST(round(u2.u_mu * k.kk * v2.v_mu / 1e18 * 1e9) AS BIGINT)
                   AS p_mu
        FROM kmat k JOIN u2 USING (x) JOIN v2 USING (y)
    ),
    tot AS (
        SELECT round(sum(CAST(p_mu AS DOUBLE) * cost) / 1e9, 4) AS cost_est
        FROM plan
    )
    SELECT p.x AS len_a, p.y AS len_b, p.cost,
           round(p.p_mu / 1e9, 6) AS plan_mass,
           t.cost_est AS transport_cost,
           CAST(row_number() OVER (ORDER BY p.p_mu DESC, p.x, p.y) AS BIGINT)
               AS rank
    FROM plan p CROSS JOIN tot t
    QUALIFY rank <= {_SK_TOPK}
    """


@register("sinkhorn_transport_plan", _sinkhorn_oracle(), tags=("X-sinkhorn",))
def sinkhorn_transport_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round Sinkhorn-Knopp entropic transport plan (Cuturi 2013)
    between src0's and src1's document-length distributions with cost
    |x - y| and epsilon = 50: alternating row/column scalings of the
    Gibbs kernel K = exp(-cost/eps) — IPF on a kernel matrix, exactly
    raking_ipf_weights' machinery pointed at optimal transport. Where
    wasserstein_source_lengths prices the move, the PLAN says which
    length mass goes where — the actual resampling schedule a
    length-matching curation pass would execute; the top-50 plan cells
    plus the entropic transport-cost estimate ride on every row.

    Scaling vectors re-quantize to nano-unit INTEGERS after every
    half-step (kernel-sum terms are nano-ints summed exactly), so both
    engines iterate identical values — exp() ulp divergence dies at the
    first rounding. Distributed shape: two support-grain count
    aggregations (length-range-bounded at any corpus size), a
    support x support kernel frame, four margin-sum join/agg rounds on
    it, one top-k window."""
    docs = table(spark, sf_dir, "documents")
    da = docs.filter(F.col("source") == _SK_A).groupBy(
        F.col("n_chars").alias("x")
    ).agg(F.count("*").cast("long").alias("ca"))
    db = docs.filter(F.col("source") == _SK_B).groupBy(
        F.col("n_chars").alias("y")
    ).agg(F.count("*").cast("long").alias("cb"))
    na = da.agg(F.sum("ca").cast("long").alias("n0"))
    nb = db.agg(F.sum("cb").cast("long").alias("n1"))
    kmat = truncate_lineage(
        da.crossJoin(db).select(
            "x",
            "y",
            "ca",
            "cb",
            F.abs(F.col("x") - F.col("y")).cast("long").alias("cost"),
            F.exp(-F.abs(F.col("x") - F.col("y")) / _SK_EPS).alias("kk"),
        ),
        eager=False,
    )  # all four scaling rounds + the plan read it
    d1 = kmat.groupBy("y").agg(
        F.sum(F.round(1000000000.0 * F.col("kk"), 0).cast("long"))
        .cast("long")
        .alias("d")
    )
    v1 = (
        d1.join(db, "y")
        .crossJoin(F.broadcast(nb))
        .select(
            "y",
            F.round(
                F.col("cb") * 1e18 / (F.col("n1") * F.col("d").cast("double")), 0
            )
            .cast("long")
            .alias("v_mu"),
        )
    )
    s1 = (
        kmat.join(F.broadcast(v1), "y")
        .groupBy("x")
        .agg(
            F.sum(F.round(F.col("kk") * F.col("v_mu"), 0).cast("long"))
            .cast("long")
            .alias("s")
        )
    )
    u1 = (
        s1.join(da, "x")
        .crossJoin(F.broadcast(na))
        .select(
            "x",
            F.round(
                F.col("ca") * 1e18 / (F.col("n0") * F.col("s").cast("double")), 0
            )
            .cast("long")
            .alias("u_mu"),
        )
    )
    d2 = (
        kmat.join(F.broadcast(u1), "x")
        .groupBy("y")
        .agg(
            F.sum(F.round(F.col("kk") * F.col("u_mu"), 0).cast("long"))
            .cast("long")
            .alias("d")
        )
    )
    v2 = (
        d2.join(db, "y")
        .crossJoin(F.broadcast(nb))
        .select(
            "y",
            F.round(
                F.col("cb") * 1e18 / (F.col("n1") * F.col("d").cast("double")), 0
            )
            .cast("long")
            .alias("v_mu"),
        )
    )
    s2 = (
        kmat.join(F.broadcast(v2), "y")
        .groupBy("x")
        .agg(
            F.sum(F.round(F.col("kk") * F.col("v_mu"), 0).cast("long"))
            .cast("long")
            .alias("s")
        )
    )
    u2 = (
        s2.join(da, "x")
        .crossJoin(F.broadcast(na))
        .select(
            "x",
            F.round(
                F.col("ca") * 1e18 / (F.col("n0") * F.col("s").cast("double")), 0
            )
            .cast("long")
            .alias("u_mu"),
        )
    )
    plan = truncate_lineage(
        kmat.join(F.broadcast(u2), "x")
        .join(F.broadcast(v2), "y")
        .select(
            "x",
            "y",
            "cost",
            F.round(F.col("u_mu") * F.col("kk") * F.col("v_mu") / 1e18 * 1e9, 0)
            .cast("long")
            .alias("p_mu"),
        ),
        eager=False,
    )  # total cost + the top-k both read it
    tot = plan.agg(
        F.round(F.sum(F.col("p_mu").cast("double") * F.col("cost")) / 1e9, 4).alias(
            "cost_est"
        )
    )
    return (
        plan.crossJoin(F.broadcast(tot))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("p_mu"), "x", "y"))
            .cast("long"),
        )
        .filter(F.col("rank") <= _SK_TOPK)
        .select(
            F.col("x").alias("len_a"),
            F.col("y").alias("len_b"),
            "cost",
            F.round(F.col("p_mu") / 1e9, 6).alias("plan_mass"),
            F.col("cost_est").alias("transport_cost"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Beta-binomial empirical-Bayes shrinkage of per-source rates (Morris 1983)
# ---------------------------------------------------------------------------


def _shrink_oracle() -> str:
    return """
    WITH per_src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS k
        FROM documents GROUP BY 1
    ),
    grand AS (
        SELECT CAST(sum(k) AS DOUBLE) / sum(n) AS pbar,
               CAST(count(*) AS BIGINT) AS n_src
        FROM per_src
    ),
    varr AS (
        SELECT sum((CAST(k AS DOUBLE) / n - g.pbar)
                 * (CAST(k AS DOUBLE) / n - g.pbar)) / (g.n_src - 1) AS s2
        FROM per_src CROSS JOIN grand g
        GROUP BY g.n_src
    ),
    hyper AS (  -- method of moments: M = pbar(1-pbar)/s2 - 1
        SELECT round(g.pbar * (g.pbar * (1 - g.pbar) / v.s2 - 1), 6) AS alpha,
               round((1 - g.pbar) * (g.pbar * (1 - g.pbar) / v.s2 - 1), 6)
                   AS beta,
               round(g.pbar, 6) AS pbar
        FROM grand g CROSS JOIN varr v
    )
    SELECT p.source, p.n AS n_docs, p.k AS en_docs,
           round(CAST(p.k AS DOUBLE) / p.n, 6) AS raw_rate,
           round((p.k + h.alpha) / (p.n + h.alpha + h.beta), 6) AS shrunk_rate,
           h.alpha, h.beta, h.pbar AS grand_rate
    FROM per_src p CROSS JOIN hyper h
    """


@register("beta_binomial_shrinkage", _shrink_oracle(), tags=("X-shrinkage",))
def beta_binomial_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta-binomial empirical-Bayes shrinkage (Morris 1983; the
    James-Stein idea for rates): per-source English-document rates
    shrunk toward the corpus rate with method-of-moments Beta(alpha,
    beta) hyper-parameters — small sources borrow strength (a 3-doc
    source's 100% English rate moves hard toward the corpus mean, a
    100-doc source barely moves), which is the estimator a mixture
    dashboard or a per-source quality gate should rank by instead of
    raw proportions. The hierarchical-estimation member the statistics
    family lacked: every other rate query publishes the MLE.

    Counts are exact; pbar is a ratio of exact sums; the between-source
    variance is the only double accumulation (|sources| terms) and the
    hyper-parameters round at 6dp before the shrinkage formula, so both
    engines shrink through identical alpha/beta. Distributed shape: one
    source-grain conditional count, two scalar rollups, one broadcast
    — nothing beyond |sources| rows after the first pass."""
    docs = table(spark, sf_dir, "documents")
    per_src = truncate_lineage(
        docs.groupBy("source").agg(
            F.count("*").cast("long").alias("n"),
            F.count(F.when(F.col("lang") == "en", 1)).cast("long").alias("k"),
        ),
        eager=False,
    )  # grand rate, variance, and the output projection all read it
    grand = per_src.agg(
        (F.sum("k").cast("double") / F.sum("n")).alias("pbar"),
        F.count("*").cast("long").alias("n_src"),
    )
    rate = F.col("k").cast("double") / F.col("n")
    varr = (
        per_src.crossJoin(F.broadcast(grand))
        .agg(
            (
                F.sum((rate - F.col("pbar")) * (rate - F.col("pbar")))
                / (F.max("n_src") - 1)
            ).alias("s2"),
            F.max("pbar").alias("pbar"),
        )
    )
    m = F.col("pbar") * (1 - F.col("pbar")) / F.col("s2") - 1
    hyper = varr.select(
        F.round(F.col("pbar") * m, 6).alias("alpha"),
        F.round((1 - F.col("pbar")) * m, 6).alias("beta"),
        F.round(F.col("pbar"), 6).alias("pbar"),
    )
    return per_src.crossJoin(F.broadcast(hyper)).select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("k").alias("en_docs"),
        F.round(rate, 6).alias("raw_rate"),
        F.round(
            (F.col("k") + F.col("alpha")) / (F.col("n") + F.col("alpha") + F.col("beta")),
            6,
        ).alias("shrunk_rate"),
        "alpha",
        "beta",
        F.col("pbar").alias("grand_rate"),
    )
