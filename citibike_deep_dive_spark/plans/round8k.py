"""Round-8 continuation batch 9: preference / experimentation /
mixture statistics — Bradley–Terry strengths from exact pairwise
win counts (Bradley & Terry 1952, MM iteration of Hunter 2004), CUPED
covariate-adjusted A/B means (Deng et al. 2013), Jensen–Shannon
divergence of each source's unigram distribution from the corpus
(Lin 1991 — the data-mixture drift metric), Adjusted Rand Index of
the IVF k-means cells against the embedding labels (Hubert & Arabie
1985 — external clustering validation, completing the internal
silhouette audit), one DoReMi-style exponentiated-gradient domain
reweight step (Xie et al. 2023), and KMV bottom-k sketch set
operations (Beyer et al. 2007 — distinct-count algebra that HLL and
MinHash signatures cannot do: union/intersection NDV estimates with
their exact counterparts side by side).

Engine-exactness disciplines (SURVEY.md §4): every pairwise win count
is computed on the zero-filled CDF grid (exact int64 products, never a
theta-join); iterative updates run a FIXED unrolled depth with
micro-unit integer intermediates so sums are order-independent;
ln()-terms follow the DSIR precedent (double sum, 5dp edge rounding);
hash-seeded sketches use the shared portable md5 hash so both engines
see identical sketch contents bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from ..functions.portable import portable_hash64, portable_hash64_sql
from ..functions.timeutil import ts_micros
from .catalog import register, table

# ---------------------------------------------------------------------------
# Bradley–Terry strengths over sources (longer-document-wins comparisons)
# ---------------------------------------------------------------------------


def _bt_oracle() -> str:
    return """
    WITH counts AS (
        SELECT source, n_chars AS x, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1),
    support AS (SELECT DISTINCT x FROM counts),
    grid AS (
        SELECT s.source, s.n, p.x, coalesce(c.c, 0) AS c,
               CAST(sum(coalesce(c.c, 0)) OVER (
                   PARTITION BY s.source ORDER BY p.x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum
        FROM srcs s CROSS JOIN support p
        LEFT JOIN counts c ON c.source = s.source AND c.x = p.x
    ),
    pairs AS (  -- ordered pairs: w2 = 2*strict wins + ties (half-units)
        SELECT a.source AS src, b.source AS dst,
               CAST(a.n AS BIGINT) * b.n AS n_ij,
               CAST(sum(2 * a.c * (b.cum - b.c) + a.c * b.c) AS BIGINT) AS w2
        FROM grid a JOIN grid b ON a.x = b.x AND a.source <> b.source
        GROUP BY 1, 2, a.n, b.n
    ),
    tot AS (
        SELECT src, CAST(sum(w2) AS BIGINT) AS w2_tot,
               CAST(sum(n_ij) AS BIGINT) AS n_tot
        FROM pairs GROUP BY 1
    ),
    p1 AS (  -- MM iteration 1 from p0 = 1: p1 = W / (sum_j n_ij / 2)
        SELECT src, w2_tot, n_tot,
               round(CAST(w2_tot AS DOUBLE) / n_tot, 6) AS p1r
        FROM tot
    ),
    denom2 AS (  -- MM iteration 2 denominator, micro-unit exact sum
        SELECT p.src,
               CAST(sum(CAST(round(1000000.0 * p.n_ij / (pi.p1r + pj.p1r))
                             AS BIGINT)) AS HUGEINT) AS den_mu
        FROM pairs p
        JOIN p1 pi ON pi.src = p.src
        JOIN p1 pj ON pj.src = p.dst
        GROUP BY 1
    ),
    p2 AS (
        SELECT t.src AS source, t.n_tot, t.w2_tot,
               (CAST(t.w2_tot AS DOUBLE) * 1000000.0 / 2.0)
                   / CAST(d.den_mu AS DOUBLE) AS p2
        FROM p1 t JOIN denom2 d ON d.src = t.src
    ),
    mu AS (
        SELECT source, n_tot, w2_tot, p2,
               CAST(round(p2 * 1000000.0) AS BIGINT) AS p2_mu
        FROM p2
    ),
    z AS (SELECT CAST(sum(p2_mu) AS BIGINT) AS z_mu FROM mu)
    SELECT source,
           CAST(n_tot AS BIGINT) AS n_comparisons,
           round(CAST(w2_tot AS DOUBLE) / (2.0 * n_tot), 6) AS win_rate,
           round(p2, 6) AS strength,
           round(CAST(p2_mu AS DOUBLE) / z.z_mu, 6) AS pi_norm,
           CAST(row_number() OVER (ORDER BY p2_mu DESC, source) AS BIGINT) AS rank
    FROM mu CROSS JOIN z
    """


@register("bradley_terry_strengths", _bt_oracle(), tags=("X-bradley-terry",))
def bradley_terry_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry preference strengths (Bradley & Terry 1952) over the
    20 sources, where every cross-source document pair is one comparison
    and the longer document wins (ties split): the model behind pairwise
    preference data in RLHF reward pipelines and the parametric
    completion of mannwhitney_source_lengths (AUC says how often i beats
    j; BT turns the full tournament into one strength per player that is
    transitive by construction). Two Hunter-2004 MM half-steps from the
    uniform start, unrolled.

    Exactness: win counts come from the zero-filled CDF grid — wins_ij =
    sum_x c_i(x) * (cum_j(x) - c_j(x)) — so the tournament matrix is
    exact int64 with NO value-pair theta-join; each MM step divides
    exact integers (iteration-2 denominators are micro-unit longs summed
    exactly) and rounds at 6dp, so both engines walk identical doubles.
    Distributed shape: one (source, length) count agg (the only
    data-grain pass), a Heaps-bounded grid with per-source cumulative
    windows, one hash equi-join on the grid point, then all iteration
    work on the |sources|^2 pair frame — broadcast scale at any corpus
    size."""
    docs = table(spark, sf_dir, "documents")
    counts = truncate_lineage(
        docs.groupBy("source", F.col("n_chars").alias("x")).agg(
            F.count("*").cast("long").alias("c")
        ),
        eager=False,
    )
    support = counts.select("x").distinct()
    srcs = counts.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    grid = (
        srcs.crossJoin(F.broadcast(support))
        .join(counts, ["source", "x"], "left")
        .select("source", "n", "x", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy("x")
    cdf = truncate_lineage(
        grid.select(
            "source",
            "n",
            "x",
            "c",
            F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cum"),
        ),
        eager=False,
    )  # both sides of the ordered-pair equi-join read it
    a, b = cdf.alias("a"), cdf.alias("b")
    pairs = truncate_lineage(
        a.join(
            b,
            (F.col("a.x") == F.col("b.x")) & (F.col("a.source") != F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src"),
            F.col("b.source").alias("dst"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(
            F.sum(
                2 * F.col("a.c") * (F.col("b.cum") - F.col("b.c"))
                + F.col("a.c") * F.col("b.c")
            )
            .cast("long")
            .alias("w2")
        )
        .select("src", "dst", (F.col("na") * F.col("nb")).alias("n_ij"), "w2"),
        eager=False,
    )  # read by tot and by the iteration-2 denominator
    tot = pairs.groupBy("src").agg(
        F.sum("w2").cast("long").alias("w2_tot"),
        F.sum("n_ij").cast("long").alias("n_tot"),
    )
    p1 = tot.withColumn(
        "p1r", F.round(F.col("w2_tot").cast("double") / F.col("n_tot"), 6)
    )
    pi = p1.select(F.col("src").alias("_i"), F.col("p1r").alias("p1_i"))
    pj = p1.select(F.col("src").alias("_j"), F.col("p1r").alias("p1_j"))
    den = (
        pairs.join(F.broadcast(pi), pairs.src == pi._i)
        .join(F.broadcast(pj), pairs.dst == pj._j)
        .groupBy("src")
        .agg(
            F.sum(
                F.round(1000000.0 * F.col("n_ij") / (F.col("p1_i") + F.col("p1_j")), 0)
                .cast("long")
            )
            .cast("decimal(38,0)")
            .alias("den_mu")
        )
    )
    p2 = (
        p1.join(den, "src")
        .withColumn(
            "p2",
            (F.col("w2_tot").cast("double") * 1000000.0 / 2.0)
            / F.col("den_mu").cast("double"),
        )
        .withColumn("p2_mu", F.round(F.col("p2") * 1000000.0, 0).cast("long"))
    )
    z = p2.agg(F.sum("p2_mu").cast("long").alias("z_mu"))
    return (
        p2.crossJoin(F.broadcast(z))
        .select(
            F.col("src").alias("source"),
            F.col("n_tot").alias("n_comparisons"),
            F.round(F.col("w2_tot").cast("double") / (2.0 * F.col("n_tot")), 6).alias(
                "win_rate"
            ),
            F.round("p2", 6).alias("strength"),
            F.round(F.col("p2_mu").cast("double") / F.col("z_mu"), 6).alias("pi_norm"),
            F.row_number()
            .over(Window.orderBy(F.desc("p2_mu"), "src"))
            .cast("long")
            .alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# CUPED covariate-adjusted A/B means (Deng et al. 2013)
# ---------------------------------------------------------------------------

# Fixed mid-January split: events span 2024-01; first half is the
# pre-experiment covariate window, second half the experiment window.
_CUPED_SPLIT_US = 1_705_363_200_000_000  # 2024-01-16 00:00:00 naive epoch µs


def _cuped_oracle() -> str:
    arm = portable_hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN {arm} % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
               CAST(sum(CASE WHEN epoch_us(ts) < {_CUPED_SPLIT_US}
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x_c,
               CAST(sum(CASE WHEN epoch_us(ts) >= {_CUPED_SPLIT_US}
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y_c
        FROM events GROUP BY 1, 2
    ),
    pooled AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x_c AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(sum(CAST(y_c AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(sum(CAST(x_c AS HUGEINT) * x_c) AS HUGEINT) AS sxx,
               CAST(sum(CAST(x_c AS HUGEINT) * y_c) AS HUGEINT) AS sxy
        FROM per_user
    ),
    theta AS (
        SELECT n, CAST(sx AS DOUBLE) / n AS xbar,
               round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                     6) AS th
        FROM pooled
    ),
    arms AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(CAST(x_c AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(sum(CAST(y_c AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(sum(CAST(x_c AS HUGEINT) * x_c) AS HUGEINT) AS sxx,
               CAST(sum(CAST(y_c AS HUGEINT) * y_c) AS HUGEINT) AS syy,
               CAST(sum(CAST(x_c AS HUGEINT) * y_c) AS HUGEINT) AS sxy
        FROM per_user GROUP BY 1
    )
    SELECT arm, n_users,
           round(CAST(sy AS DOUBLE) / (100.0 * n_users), 4) AS mean_y,
           round((CAST(sy AS DOUBLE) - th * (CAST(sx AS DOUBLE) - n_users * xbar))
                 / (100.0 * n_users), 4) AS adjusted_mean,
           th AS theta,
           round(100.0 * (1.0 -
               ((CAST(syy AS DOUBLE) - 2 * th * CAST(sxy AS DOUBLE)
                 + th * th * CAST(sxx AS DOUBLE))
                - (CAST(sy AS DOUBLE) - th * CAST(sx AS DOUBLE))
                  * (CAST(sy AS DOUBLE) - th * CAST(sx AS DOUBLE)) / n_users)
               / (CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n_users)), 2)
               AS var_reduction_pct
    FROM arms CROSS JOIN theta
    """


@register("cuped_adjusted_ab", _cuped_oracle(), tags=("X-cuped",))
def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED covariate-adjusted A/B arm means (Deng et al. 2013, the
    standard experimentation variance-reduction): users hash-split into
    two arms, per-user pre-period spend (first half of January) is the
    covariate X, post-period spend the outcome Y; theta = cov(X,Y)/var(X)
    is fit POOLED (arm-blind, so adjustment cannot leak treatment
    signal), and each arm reports mean(Y - theta * (X - xbar)) next to
    the raw mean and the achieved variance-reduction percentage. The
    missing member of the experimentation family (Welch/SPRT/McNemar
    test significance; CUPED buys the power).

    Exactness: per-user sums are exact cent integers in ONE pass
    (conditional sums on the fixed epoch-µs split); theta and both
    means are ratios of decimal-exact power sums (theta rounded 6dp
    before reuse), so both engines walk identical doubles. Distributed
    shape: one user-grain aggregation (map-side combined), then
    two-row arm rollups with a broadcast theta scalar — no data-grain
    window, no second scan."""
    ev = table(spark, sf_dir, "events")
    us = ts_micros(ev)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    per_user = truncate_lineage(
        ev.groupBy(
            "user_id",
            F.when(
                portable_hash64(F.col("user_id").cast("string")) % 2 == 0, "control"
            )
            .otherwise("treatment")
            .alias("arm"),
        ).agg(
            F.sum(F.when(us < _CUPED_SPLIT_US, cents).otherwise(0))
            .cast("long")
            .alias("x_c"),
            F.sum(F.when(us >= _CUPED_SPLIT_US, cents).otherwise(0))
            .cast("long")
            .alias("y_c"),
        ),
        eager=False,
    )  # pooled theta and the arm rollup both read it
    dx = F.col("x_c").cast("decimal(38,0)")
    dy = F.col("y_c").cast("decimal(38,0)")
    pooled = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * F.col("x_c")).alias("sxx"),
        F.sum(dx * F.col("y_c")).alias("sxy"),
    )
    theta = pooled.select(
        (F.col("sx").cast("double") / F.col("n")).alias("xbar"),
        F.round(
            (F.col("n") * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (F.col("n") * F.col("sxx").cast("double")
               - F.col("sx").cast("double") * F.col("sx").cast("double")),
            6,
        ).alias("th"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * F.col("x_c")).alias("sxx"),
        F.sum(dy * F.col("y_c")).alias("syy"),
        F.sum(dx * F.col("y_c")).alias("sxy"),
    )
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    syyd = F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    th = F.col("th")
    adj_ss = (syyd - 2 * th * sxyd + th * th * sxxd
              - (syd - th * sxd) * (syd - th * sxd) / F.col("n_users"))
    raw_ss = syyd - syd * syd / F.col("n_users")
    return arms.crossJoin(F.broadcast(theta)).select(
        "arm",
        "n_users",
        F.round(syd / (100.0 * F.col("n_users")), 4).alias("mean_y"),
        F.round(
            (syd - th * (sxd - F.col("n_users") * F.col("xbar")))
            / (100.0 * F.col("n_users")),
            4,
        ).alias("adjusted_mean"),
        th.alias("theta"),
        F.round(100.0 * (1.0 - adj_ss / raw_ss), 2).alias("var_reduction_pct"),
    )


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence of source unigram mixtures (Lin 1991)
# ---------------------------------------------------------------------------


def _jsd_oracle() -> str:
    return """
    WITH toks AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    sc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
    corpus AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ct FROM sc GROUP BY 1),
    scalars AS (SELECT CAST(sum(ct) AS BIGINT) AS t FROM corpus),
    per_src AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS ts,
               CAST(count(*) AS BIGINT) AS vocab
        FROM sc GROUP BY 1
    ),
    terms AS (  -- in-support contribution + covered corpus mass
        SELECT s.source,
               sum(0.5 * ((CAST(s.c AS DOUBLE) / p.ts)
                          * ln((CAST(s.c AS DOUBLE) / p.ts)
                               / ((CAST(s.c AS DOUBLE) / p.ts
                                   + CAST(k.ct AS DOUBLE) / x.t) / 2))
                        + (CAST(k.ct AS DOUBLE) / x.t)
                          * ln((CAST(k.ct AS DOUBLE) / x.t)
                               / ((CAST(s.c AS DOUBLE) / p.ts
                                   + CAST(k.ct AS DOUBLE) / x.t) / 2)))) AS inner_sum,
               sum(CAST(k.ct AS DOUBLE) / x.t) AS q_cov
        FROM sc s
        JOIN corpus k USING (tok)
        JOIN per_src p USING (source)
        CROSS JOIN scalars x
        GROUP BY 1
    )
    SELECT p.source, p.ts AS n_tokens, p.vocab,
           round(t.inner_sum + 0.5 * ln(2) * (1.0 - t.q_cov), 5) AS jsd_nats,
           round((t.inner_sum + 0.5 * ln(2) * (1.0 - t.q_cov)) / ln(2), 5) AS jsd_bits
    FROM per_src p JOIN terms t USING (source)
    """


@register("js_divergence_source_unigrams", _jsd_oracle(), tags=("X-jsd",))
def js_divergence_source_unigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence (Lin 1991) between each source's
    unigram distribution and the corpus mixture — the bounded, symmetric
    drift metric data-mixture work reports (KL blows up on unshared
    vocabulary; JSD <= ln 2 always): a source near 0 writes like the
    corpus, a source near ln 2 is distributionally alien, which is the
    ordering temperature_source_mix / doremi reweighting act on.

    The out-of-support tail is folded CLOSED-FORM: tokens the source
    never uses contribute exactly 0.5*ln2*(1 - covered corpus mass), so
    the sum runs only over the source's own support — no |vocab| x
    |sources| grid materializes (the wasserstein construction would).
    ln-terms take exact integer count ratios and follow the DSIR 5dp
    edge-rounding precedent. Distributed shape: one token explode into
    a (source, tok) count agg, one Heaps-bounded corpus-count join,
    one source-grain rollup."""
    docs = table(spark, sf_dir, "documents")
    sc = truncate_lineage(
        docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c")),
        eager=False,
    )  # corpus counts, per-source totals, and the term join all read it
    corpus = sc.groupBy("tok").agg(F.sum("c").cast("long").alias("ct"))
    scalars = corpus.agg(F.sum("ct").cast("long").alias("t"))
    per_src = sc.groupBy("source").agg(
        F.sum("c").cast("long").alias("ts"),
        F.count("*").cast("long").alias("vocab"),
    )
    joined = (
        sc.join(corpus, "tok")
        .join(F.broadcast(per_src.select("source", "ts")), "source")
        .crossJoin(F.broadcast(scalars))
    )
    p = F.col("c").cast("double") / F.col("ts")
    q = F.col("ct").cast("double") / F.col("t")
    m = (p + q) / 2
    terms = joined.groupBy("source").agg(
        F.sum(0.5 * (p * F.log(p / m) + q * F.log(q / m))).alias("inner_sum"),
        F.sum(q).alias("q_cov"),
    )
    ln2 = 0.6931471805599453
    jsd = F.col("inner_sum") + 0.5 * ln2 * (1.0 - F.col("q_cov"))
    return per_src.join(terms, "source").select(
        "source",
        F.col("ts").alias("n_tokens"),
        "vocab",
        F.round(jsd, 5).alias("jsd_nats"),
        F.round(jsd / ln2, 5).alias("jsd_bits"),
    )


# ---------------------------------------------------------------------------
# Adjusted Rand Index: IVF k-means cells vs embedding labels
# ---------------------------------------------------------------------------


def _ari_oracle() -> str:
    from .training import _kmeans_cte

    return (
        _kmeans_cte(8, 3)
        + """,
    cont AS (
        SELECT f.cell, b.label, CAST(count(*) AS BIGINT) AS nij
        FROM final f JOIN embeddings b ON f.id = b.vec_id
        GROUP BY 1, 2
    ),
    cells AS (SELECT cell, CAST(sum(nij) AS BIGINT) AS a FROM cont GROUP BY 1),
    labels AS (SELECT label, CAST(sum(nij) AS BIGINT) AS b FROM cont GROUP BY 1),
    sums AS (
        SELECT CAST((SELECT sum(nij * (nij - 1) / 2) FROM cont) AS BIGINT) AS idx,
               CAST((SELECT sum(a * (a - 1) / 2) FROM cells) AS BIGINT) AS sa,
               CAST((SELECT sum(b * (b - 1) / 2) FROM labels) AS BIGINT) AS sb,
               CAST((SELECT sum(a) FROM cells) AS BIGINT) AS n
    ),
    ari AS (
        SELECT round(
            (idx - CAST(sa AS DOUBLE) * sb / (n * (n - 1) / 2))
            / ((CAST(sa AS DOUBLE) + sb) / 2
               - CAST(sa AS DOUBLE) * sb / (n * (n - 1) / 2)), 6) AS ari
        FROM sums
    ),
    maj AS (
        SELECT cell, label AS majority_label, nij AS maj_n,
               row_number() OVER (PARTITION BY cell
                                  ORDER BY nij DESC, label) AS rn
        FROM cont
    )
    SELECT c.cell, c.a AS n_vectors, m.majority_label,
           round(CAST(m.maj_n AS DOUBLE) / c.a, 6) AS purity,
           ari.ari AS ari
    FROM cells c
    JOIN maj m ON m.cell = c.cell AND m.rn = 1
    CROSS JOIN ari
    """
    )


@register("adjusted_rand_labels_vs_cells", _ari_oracle(), tags=("X-ari",))
def adjusted_rand_labels_vs_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand Index (Hubert & Arabie 1985) of the deterministic
    8-cell / 3-iteration IVF k-means partition against the embedding
    labels — EXTERNAL clustering validation completing the audit pair
    with silhouette_simplified_ivf (internal geometry): ARI ~ 0 means
    the cells are label-random (chance-corrected, unlike raw Rand),
    ARI -> 1 means the IVF routing almost reproduces the labels. Per
    cell the majority label and purity localize WHERE the disagreement
    lives; the scalar ARI is carried on every row.

    Exactness: the ARI numerator/denominator are pure pair-counting
    combinatorics — every C(n,2) term is an exact integer (n(n-1) is
    even, so the halving is exact) and only the final ratio is a
    rounded double. Distributed shape: the k-means loop (checkpointed
    per round), one broadcast (vectors x 8 centroids) argmin
    assignment, one (cell,label) contingency aggregation — everything
    after the assignment is at most |cells| x |labels| rows."""
    from ..operators.similarity import kmeans

    emb = table(spark, sf_dir, "embeddings")
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
    cont = truncate_lineage(
        assign.join(emb.select(F.col("vec_id").alias("id"), "label"), "id")
        .groupBy("cell", "label")
        .agg(F.count("*").cast("long").alias("nij")),
        eager=False,
    )  # cells, labels, pair sums, and majority rows all read it
    comb2 = lambda col: (col * (col - 1) / 2).cast("long")  # noqa: E731
    cells = cont.groupBy("cell").agg(F.sum("nij").cast("long").alias("a"))
    labels = cont.groupBy("label").agg(F.sum("nij").cast("long").alias("b"))
    sums = (
        cont.agg(F.sum(comb2(F.col("nij"))).cast("long").alias("idx"))
        .crossJoin(
            F.broadcast(
                cells.agg(
                    F.sum(comb2(F.col("a"))).cast("long").alias("sa"),
                    F.sum("a").cast("long").alias("n"),
                )
            )
        )
        .crossJoin(
            F.broadcast(labels.agg(F.sum(comb2(F.col("b"))).cast("long").alias("sb")))
        )
    )
    exp_ = F.col("sa").cast("double") * F.col("sb") / (
        F.col("n") * (F.col("n") - 1) / 2
    )
    ari = sums.select(
        F.round(
            (F.col("idx") - exp_)
            / ((F.col("sa").cast("double") + F.col("sb")) / 2 - exp_),
            6,
        ).alias("ari")
    )
    maj = (
        cont.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cell").orderBy(F.desc("nij"), "label")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("cell", F.col("label").alias("majority_label"), F.col("nij").alias("maj_n"))
    )
    return (
        cells.join(maj, "cell")
        .crossJoin(F.broadcast(ari))
        .select(
            "cell",
            F.col("a").alias("n_vectors"),
            "majority_label",
            F.round(F.col("maj_n").cast("double") / F.col("a"), 6).alias("purity"),
            "ari",
        )
    )


# ---------------------------------------------------------------------------
# DoReMi-style domain reweight step (Xie et al. 2023)
# ---------------------------------------------------------------------------

_DOREMI_ETA = 1.0


def _doremi_oracle() -> str:
    return f"""
    WITH toks AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    sc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
    corpus AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ct FROM sc GROUP BY 1),
    scalars AS (
        SELECT CAST(sum(ct) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
        FROM corpus
    ),
    nll AS (  -- per-source mean NLL under the +1-smoothed corpus unigram LM
        SELECT s.source, CAST(sum(s.c) AS BIGINT) AS n_tokens,
               round(-sum(s.c * ln((k.ct + 1.0) / (x.t + x.v)))
                     / sum(s.c), 5) AS avg_nll
        FROM sc s JOIN corpus k USING (tok) CROSS JOIN scalars x
        GROUP BY 1
    ),
    base AS (SELECT min(avg_nll) AS base_nll FROM nll),
    ex AS (
        SELECT source, n_tokens, avg_nll,
               round(avg_nll - base_nll, 5) AS excess_nll
        FROM nll CROSS JOIN base
    ),
    mu AS (
        SELECT source, n_tokens, avg_nll, excess_nll,
               CAST(round(exp({_DOREMI_ETA} * excess_nll) * 1000000)
                    AS BIGINT) AS e_mu
        FROM ex
    ),
    z AS (SELECT CAST(sum(e_mu) AS BIGINT) AS z_mu FROM mu)
    SELECT source, n_tokens, avg_nll, excess_nll,
           round(CAST(e_mu AS DOUBLE) / z.z_mu, 6) AS alpha_new
    FROM mu CROSS JOIN z
    """


@register("doremi_domain_reweight_step", _doremi_oracle(), tags=("X-doremi",))
def doremi_domain_reweight_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi-style exponentiated-gradient domain reweight step
    (Xie et al. 2023, Group-DRO update): each source's proxy loss is its
    mean token NLL under the +1-smoothed corpus unigram LM (the
    distributable stand-in for the proxy model's loss), excess loss is
    measured against the best-fitting source, and the new mixture weight
    is alpha_s proportional to exp(eta * excess_s) from the uniform
    start — domains the reference model explains worst get upweighted,
    which is the DoReMi signal temperature_source_mix's popularity-based
    weights cannot see.

    Exactness: NLL terms are ln() of exact integer count ratios summed
    then 5dp-rounded (the DSIR precedent); the softmax numerators
    become micro-unit integers BEFORE the normalizing sum, so Z is
    order-independent and alpha is a ratio of exact integers.
    Distributed shape: one token explode into the shared (source, tok)
    count agg, one Heaps-bounded corpus join, a source-grain rollup,
    then scalar broadcasts — nothing beyond |sources| rows after the
    rollup."""
    docs = table(spark, sf_dir, "documents")
    sc = truncate_lineage(
        docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c")),
        eager=False,
    )
    corpus = sc.groupBy("tok").agg(F.sum("c").cast("long").alias("ct"))
    scalars = corpus.agg(
        F.sum("ct").cast("long").alias("t"), F.count("*").cast("long").alias("v")
    )
    nll = (
        sc.join(corpus, "tok")
        .crossJoin(F.broadcast(scalars))
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(
                -F.sum(
                    F.col("c")
                    * F.log((F.col("ct") + 1.0) / (F.col("t") + F.col("v")))
                )
                / F.sum("c"),
                5,
            ).alias("avg_nll"),
        )
    )
    base = nll.agg(F.min("avg_nll").alias("base_nll"))
    mu = (
        nll.crossJoin(F.broadcast(base))
        .withColumn("excess_nll", F.round(F.col("avg_nll") - F.col("base_nll"), 5))
        .withColumn(
            "e_mu",
            F.round(F.exp(_DOREMI_ETA * F.col("excess_nll")) * 1000000, 0).cast(
                "long"
            ),
        )
    )
    z = mu.agg(F.sum("e_mu").cast("long").alias("z_mu"))
    return mu.crossJoin(F.broadcast(z)).select(
        "source",
        "n_tokens",
        "avg_nll",
        "excess_nll",
        F.round(F.col("e_mu").cast("double") / F.col("z_mu"), 6).alias("alpha_new"),
    )


# ---------------------------------------------------------------------------
# KMV bottom-k sketch set operations (Beyer et al. 2007)
# ---------------------------------------------------------------------------

_KMV_K = 32
_KMV_DOMAIN = float(1 << 60)  # portable_hash64 is uniform on [0, 16^15)


def _kmv_oracle() -> str:
    h = portable_hash64_sql("tok")
    return f"""
    WITH st AS (
        SELECT DISTINCT source, tok
        FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
    ),
    hashed AS (SELECT source, tok, {h} AS h FROM st),
    sketch AS (
        SELECT source, h FROM (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM hashed
        ) WHERE rn <= {_KMV_K}
    ),
    names AS (SELECT DISTINCT source FROM st),
    prs AS (
        SELECT a.source AS sa, b.source AS sb
        FROM names a JOIN names b ON a.source < b.source
    ),
    sides AS (
        SELECT p.sa, p.sb, s.h, 1 AS in_a, 0 AS in_b
        FROM prs p JOIN sketch s ON s.source = p.sa
        UNION ALL
        SELECT p.sa, p.sb, s.h, 0, 1
        FROM prs p JOIN sketch s ON s.source = p.sb
    ),
    merged AS (
        SELECT sa, sb, h, max(in_a) AS in_a, max(in_b) AS in_b
        FROM sides GROUP BY 1, 2, 3
    ),
    topk AS (
        SELECT sa, sb, h, in_a, in_b FROM (
            SELECT sa, sb, h, in_a, in_b,
                   row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
            FROM merged
        ) WHERE rn <= {_KMV_K}
    ),
    est AS (
        SELECT sa, sb, CAST(count(*) AS BIGINT) AS m,
               CAST(max(h) AS BIGINT) AS kth,
               CAST(sum(in_a * in_b) AS BIGINT) AS n_both
        FROM topk GROUP BY 1, 2
    ),
    exact_nd AS (SELECT source, CAST(count(*) AS BIGINT) AS nd FROM st GROUP BY 1),
    exact_int AS (
        SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS ni
        FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT e.sa AS source_a, e.sb AS source_b,
           CAST({_KMV_K} AS BIGINT) AS k,
           round(CASE WHEN e.m < {_KMV_K} THEN CAST(e.m AS DOUBLE)
                      ELSE ({_KMV_K} - 1) / (CAST(e.kth AS DOUBLE) / {_KMV_DOMAIN})
                 END, 2) AS union_est,
           CAST(na.nd + nb.nd - coalesce(xi.ni, 0) AS BIGINT) AS union_exact,
           round(CAST(e.n_both AS DOUBLE) / e.m, 4) AS jaccard_est,
           round(CAST(coalesce(xi.ni, 0) AS DOUBLE)
                 / (na.nd + nb.nd - coalesce(xi.ni, 0)), 4) AS jaccard_exact
    FROM est e
    JOIN exact_nd na ON na.source = e.sa
    JOIN exact_nd nb ON nb.source = e.sb
    LEFT JOIN exact_int xi ON xi.sa = e.sa AND xi.sb = e.sb
    """


@register("kmv_sketch_set_ops", _kmv_oracle(), tags=("X-kmv",))
def kmv_sketch_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k sketch set algebra (Beyer et al. 2007) over
    per-source distinct-token sets: keep each source's k=32 smallest
    portable-md5 hash values; for every source pair, merge the two
    sketches, re-take the bottom k, and read off the union NDV estimate
    (k-1)/U_(k) and the Jaccard estimate |both-in-top-k|/k — the
    distinct-count SET ALGEBRA that neither HLL (approx_distinct_hll:
    no intersections) nor the MinHash signature matrix
    (source_minhash_similarity: similarity only, no cardinalities)
    provides. Exact union/Jaccard ride along per pair, so the query is
    its own error audit; a merged sketch smaller than k IS the exact
    set and the estimator degrades to it gracefully.

    Exactness: sketch contents are integers from the shared portable
    md5 hash — both engines keep bit-identical bottom-k rows — and only
    the two estimator divisions round. Distributed shape: one distinct
    (source, token) pass, a per-source bottom-k window
    (WindowGroupLimit — k rows per source survive the shuffle), then
    all pair work on |sources| * k sketch rows; the exact-intersection
    audit is one token equi-join on the distinct frame (drop it at
    true scale and the sketch path alone touches the data once)."""
    docs = table(spark, sf_dir, "documents")
    st = truncate_lineage(
        docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        ).distinct(),
        eager=False,
    )  # sketch, names, exact NDV, and the exact-intersection join read it
    hashed = st.select("source", "tok", portable_hash64(F.col("tok")).alias("h"))
    sketch = (
        hashed.withColumn(
            "rn", F.row_number().over(Window.partitionBy("source").orderBy("h"))
        )
        .filter(F.col("rn") <= _KMV_K)
        .select("source", "h")
    )
    sketch = truncate_lineage(sketch, eager=False)  # joined twice into sides
    names = st.select("source").distinct()
    na, nb = names.alias("na"), names.alias("nb")
    prs = na.join(nb, F.col("na.source") < F.col("nb.source")).select(
        F.col("na.source").alias("sa"), F.col("nb.source").alias("sb")
    )
    prs = truncate_lineage(prs, eager=False)
    side_a = prs.join(
        sketch.select(F.col("source").alias("sa"), "h"), "sa"
    ).select("sa", "sb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    side_b = prs.join(
        sketch.select(F.col("source").alias("sb"), "h"), "sb"
    ).select("sa", "sb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        side_a.unionByName(side_b)
        .groupBy("sa", "sb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    topk = merged.withColumn(
        "rn", F.row_number().over(Window.partitionBy("sa", "sb").orderBy("h"))
    ).filter(F.col("rn") <= _KMV_K)
    est = topk.groupBy("sa", "sb").agg(
        F.count("*").cast("long").alias("m"),
        F.max("h").cast("long").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
    )
    exact_nd = st.groupBy("source").agg(F.count("*").cast("long").alias("nd"))
    sa_, sb_ = st.alias("xa"), st.alias("xb")
    exact_int = (
        sa_.join(
            sb_,
            (F.col("xa.tok") == F.col("xb.tok"))
            & (F.col("xa.source") < F.col("xb.source")),
        )
        .groupBy(F.col("xa.source").alias("sa"), F.col("xb.source").alias("sb"))
        .agg(F.count("*").cast("long").alias("ni"))
    )
    union_est = F.when(
        F.col("m") < _KMV_K, F.col("m").cast("double")
    ).otherwise((_KMV_K - 1) / (F.col("kth").cast("double") / _KMV_DOMAIN))
    ux = F.col("nd_a") + F.col("nd_b") - F.coalesce(F.col("ni"), F.lit(0))
    return (
        est.join(
            F.broadcast(exact_nd.select(F.col("source").alias("sa"),
                                        F.col("nd").alias("nd_a"))),
            "sa",
        )
        .join(
            F.broadcast(exact_nd.select(F.col("source").alias("sb"),
                                        F.col("nd").alias("nd_b"))),
            "sb",
        )
        .join(exact_int, ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.lit(_KMV_K).cast("long").alias("k"),
            F.round(union_est, 2).alias("union_est"),
            ux.cast("long").alias("union_exact"),
            F.round(F.col("n_both").cast("double") / F.col("m"), 4).alias(
                "jaccard_est"
            ),
            F.round(
                F.coalesce(F.col("ni"), F.lit(0)).cast("double") / ux, 4
            ).alias("jaccard_exact"),
        )
    )
