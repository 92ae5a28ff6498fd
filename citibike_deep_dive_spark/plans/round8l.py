"""Round-8 continuation batch 10: data valuation, corpus comparison,
richness estimation, graph structure, time-series decomposition, and
ranking agreement — exact KNN-Shapley values (Jia et al. 2019, the
closed-form per-example data-valuation method that scales where
retraining-based Shapley cannot), Monroe et al. 2008 "Fightin' Words"
log-odds with informative Dirichlet prior (the corpus-comparison
z-score PMI and TF-IDF both get wrong for rare words), Chao1 species
richness + Good's coverage per source (Chao 1984 — how much vocabulary
a source has that we have NOT yet seen), degree assortativity of the
mutual-kNN embedding graph (Newman 2002 — hubby-with-hubby mixing, the
global structure number the local graph family misses), an additive
trend/seasonal/remainder decomposition of daily volume (the classical
pre-STL decomposition: centered 7-day MA trend, day-of-week seasonal,
remainder — what cusum/EWMA should run on instead of raw volume), and
rank-biased overlap (Webber et al. 2010 — top-weighted agreement
between two document rankings, the comparison Spearman's rho over full
permutations cannot top-weight).

Engine-exactness: every recursion is telescoped into suffix sums of
micro-unit integers (KNN-Shapley) or kept as exact integer/rational
window arithmetic (trend, RBO counts); rankings order by ROUNDED scores
with explicit tiebreaks so both engines pick identical rows; ln/sqrt/
pow enter only at rounded edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table

# ---------------------------------------------------------------------------
# Exact KNN-Shapley data valuation (Jia et al. 2019)
# ---------------------------------------------------------------------------

_SHAP_K = 5
_SHAP_QMOD = 50  # vec_id % 50 == 0 -> held-out query points


def _shapley_oracle() -> str:
    from .training import _cos_sql

    cos = _cos_sql("q.embedding", "c.embedding")
    return f"""
    WITH q AS (
        SELECT vec_id AS qid, label AS qlabel, embedding
        FROM embeddings WHERE vec_id % {_SHAP_QMOD} = 0
    ),
    c AS (
        SELECT vec_id AS cid, label AS clabel, embedding
        FROM embeddings WHERE vec_id % {_SHAP_QMOD} <> 0
    ),
    ranked AS (
        SELECT q.qid, c.cid, c.clabel,
               CASE WHEN c.clabel = q.qlabel THEN 1 ELSE 0 END AS hit,
               row_number() OVER (PARTITION BY q.qid
                                  ORDER BY {cos} DESC, c.cid) AS rn
        FROM q CROSS JOIN c
    ),
    sized AS (
        SELECT qid, CAST(count(*) AS BIGINT) AS n,
               CAST(max(CASE WHEN rn = (SELECT count(*) FROM c) THEN hit END)
                    AS BIGINT) AS hit_last
        FROM ranked GROUP BY 1
    ),
    terms AS (
        SELECT r.qid, r.cid, r.clabel, r.rn,
               CAST(coalesce(CASE WHEN r.rn < s.n THEN
                   CAST(round(1000000000.0
                        * (r.hit - lead(r.hit) OVER (PARTITION BY r.qid
                                                     ORDER BY r.rn))
                        * least({_SHAP_K}, r.rn)
                        / ({_SHAP_K}.0 * r.rn)) AS BIGINT)
               END, 0) AS BIGINT) AS t_mu,
               s.n, s.hit_last
        FROM ranked r JOIN sized s USING (qid)
    ),
    svals AS (
        SELECT qid, cid, clabel,
               CAST(round(1000000000.0 * hit_last / n) AS BIGINT)
               + CAST(sum(t_mu) OVER (PARTITION BY qid ORDER BY rn
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS BIGINT) AS s_mu
        FROM terms
    ),
    agg AS (
        SELECT cid, clabel, CAST(count(*) AS BIGINT) AS n_queries,
               CAST(sum(s_mu) AS BIGINT) AS sum_mu
        FROM svals GROUP BY 1, 2
    )
    SELECT cid AS vec_id, clabel AS label, n_queries,
           round(CAST(sum_mu AS DOUBLE) / (1000000000.0 * n_queries), 6)
               AS mean_shapley,
           CAST(row_number() OVER (ORDER BY sum_mu DESC, cid) AS BIGINT) AS rank
    FROM agg
    """


@register("knn_shapley_values", _shapley_oracle(), tags=("X-knn-shapley",))
def knn_shapley_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact KNN-Shapley data valuation (Jia et al. 2019): the Shapley
    value of every corpus vector for a K=5 nearest-neighbor classifier
    over a held-out query set (vec_id % 50 == 0), computed by the
    closed-form rank recursion s_i = s_(i+1) + (hit_i - hit_(i+1)) *
    min(K, i) / (K * i) — the per-example valuation behind data
    cleaning/pricing that retraining-based Shapley cannot scale to,
    and the example-grain refinement of loo_source_value (which prices
    whole sources). Negative values mark examples that HURT the
    classifier — mislabeled/poisoned candidates.

    Exactness: the recursion telescopes into a SUFFIX SUM over ranks,
    each term a micro-unit integer from exact small-integer ratios, so
    window accumulation order cannot matter; per-query base values and
    the cross-query mean are exact integer sums with one rounded edge.
    Distributed shape: the brute-force ANN framing — bounded query set
    broadcast against the corpus, one rank window per query partition
    (N rows per query), then k-free suffix-sum windows on the same
    partitioning and a corpus-grain rollup. At true scale the ranking
    substrate swaps to the IVF shortlist exactly as ann_ivfpq_rerank
    does; the valuation algebra is unchanged."""
    from ..operators.similarity import _dot, _norm

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") % _SHAP_QMOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qemb"),
        _norm(F.col("embedding")).alias("qnorm"),
    )
    c = emb.filter(F.col("vec_id") % _SHAP_QMOD != 0).select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clabel"),
        F.col("embedding").alias("cemb"),
        _norm(F.col("embedding")).alias("cnorm"),
    )
    # 4dp to match _cos_sql exactly — the rank order (and with it every
    # downstream Shapley value) must tie-break identically on both engines
    cos = F.round(
        _dot(F.col("qemb"), F.col("cemb")) / (F.col("qnorm") * F.col("cnorm")), 4
    )
    # r14 checkpoint audit: the rank frame flows through ONE window chain
    # (sized -> terms -> svals are stacked windows over the same
    # partitioning, not separate plan consumers — the old "both read it"
    # comment was wrong), so its checkpoint only subsidized warm re-runs
    # of the same df while paying a (q x c)-grain write+read inside every
    # single execution. Dropped.
    ranked = (
        c.crossJoin(F.broadcast(q))
        .select(
            "qid",
            "cid",
            "clabel",
            (F.col("clabel") == F.col("qlabel")).cast("int").alias("hit"),
            cos.alias("cs"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("cs"), "cid")
            ),
        )
        .drop("cs")
    )
    # Everything between the checkpointed rank frame and the corpus-grain
    # rollup is WINDOW arithmetic over the one qid partitioning — no
    # joins, no broadcasts (a sized/totals broadcast-join formulation
    # re-ran ~30 AQE stages per execution, 3.5 s warm of pure scheduling;
    # this form is one exchange + stacked window passes). The suffix sum
    # is total - prefix + current: Spark's (currentRow,
    # unboundedFollowing) frame is the non-incremental
    # UnboundedFollowingWindowFunctionFrame (re-aggregates the tail per
    # row, O(rows^2) per partition), while the whole-partition and
    # prefix frames are single-pass.
    wq = Window.partitionBy("qid").orderBy("rn")
    wall = Window.partitionBy("qid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sized = ranked.select(
        "qid",
        "cid",
        "clabel",
        "rn",
        "hit",
        F.count("*").over(wall).cast("long").alias("n"),
        F.max(F.struct("rn", "hit")).over(wall).getField("hit")
        .cast("long")
        .alias("hit_last"),
    )
    t_mu = F.when(
        F.col("rn") < F.col("n"),
        F.round(
            1000000000.0
            * (F.col("hit") - F.lead("hit").over(wq))
            * F.least(F.lit(_SHAP_K), F.col("rn"))
            / (float(_SHAP_K) * F.col("rn")),
            0,
        ).cast("long"),
    )
    terms = sized.select(
        "qid",
        "cid",
        "clabel",
        "rn",
        F.coalesce(t_mu, F.lit(0)).alias("t_mu"),
        F.round(1000000000.0 * F.col("hit_last") / F.col("n"), 0)
        .cast("long")
        .alias("base_mu"),
    )
    prefix = F.sum("t_mu").over(
        wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ).cast("long")
    total_mu = F.sum("t_mu").over(wall).cast("long")
    svals = terms.select(
        "qid",
        "cid",
        "clabel",
        (F.col("base_mu") + total_mu - prefix + F.col("t_mu")).alias("s_mu"),
    )
    agg = svals.groupBy("cid", "clabel").agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum("s_mu").cast("long").alias("sum_mu"),
    )
    return agg.select(
        F.col("cid").alias("vec_id"),
        F.col("clabel").alias("label"),
        "n_queries",
        F.round(
            F.col("sum_mu").cast("double") / (1000000000.0 * F.col("n_queries")), 6
        ).alias("mean_shapley"),
        F.row_number()
        .over(Window.orderBy(F.desc("sum_mu"), "cid"))
        .cast("long")
        .alias("rank"),
    )


# ---------------------------------------------------------------------------
# "Fightin' Words" log-odds with informative Dirichlet prior (Monroe 2008)
# ---------------------------------------------------------------------------

_LO_ALPHA0 = 200.0
_LO_TOPK = 3


def _logodds_oracle() -> str:
    return f"""
    WITH toks AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    sc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
    corpus AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ct FROM sc GROUP BY 1),
    scalars AS (SELECT CAST(sum(ct) AS BIGINT) AS t FROM corpus),
    per_src AS (SELECT source, CAST(sum(c) AS BIGINT) AS ts FROM sc GROUP BY 1),
    scored AS (
        SELECT s.source, s.tok, s.c,
               ln((s.c + {_LO_ALPHA0} * k.ct / x.t)
                  / (p.ts + {_LO_ALPHA0} - s.c - {_LO_ALPHA0} * k.ct / x.t))
             - ln((k.ct - s.c + {_LO_ALPHA0} * k.ct / x.t)
                  / (x.t - p.ts + {_LO_ALPHA0} - (k.ct - s.c)
                     - {_LO_ALPHA0} * k.ct / x.t)) AS delta,
               1.0 / (s.c + {_LO_ALPHA0} * k.ct / x.t)
             + 1.0 / (k.ct - s.c + {_LO_ALPHA0} * k.ct / x.t) AS var
        FROM sc s
        JOIN corpus k USING (tok)
        JOIN per_src p USING (source)
        CROSS JOIN scalars x
    ),
    z AS (
        SELECT source, tok, c,
               round(delta, 5) AS log_odds,
               round(delta / sqrt(var), 5) AS z_score
        FROM scored
    )
    SELECT source, tok, c AS c_source, log_odds, z_score
    FROM (
        SELECT *, row_number() OVER (PARTITION BY source
                                     ORDER BY z_score DESC, tok) AS rn
        FROM z
    ) WHERE rn <= {_LO_TOPK}
    """


@register("log_odds_fightin_words", _logodds_oracle(), tags=("X-log-odds",))
def log_odds_fightin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe, Colaresi & Quinn 2008 "Fightin' Words": per-source
    log-odds of token use against the REST of the corpus with an
    informative Dirichlet prior (alpha_t proportional to corpus
    frequency, alpha0 = 200 pseudo-tokens), z-standardized by the
    delta's variance — the corpus-comparison statistic that fixes both
    failure modes of its neighbors: PMI (pmi_bigram_collocations)
    explodes on rare words, TF-IDF rewards absence; the prior shrinks
    rare-word estimates and the variance term penalizes what little
    evidence they have. Top-{_LO_TOPK} most OVERUSED tokens per source
    = that source's lexical fingerprint.

    Ranking orders by the ROUNDED z-score with a token tiebreak (the
    kmeans-argmin discipline) so both engines pick identical rows even
    at double ulp boundaries. Distributed shape: the shared
    (source, tok) count aggregation, one Heaps-bounded corpus-count
    join (rest-counts come from corpus minus own — no second scan, no
    anti-join), a per-source top-k window (WindowGroupLimit)."""
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
    scalars = corpus.agg(F.sum("ct").cast("long").alias("t"))
    per_src = sc.groupBy("source").agg(F.sum("c").cast("long").alias("ts"))
    j = (
        sc.join(corpus, "tok")
        .join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(scalars))
    )
    alpha = _LO_ALPHA0 * F.col("ct") / F.col("t")
    y_s = F.col("c") + alpha
    n_s = F.col("ts") + _LO_ALPHA0 - F.col("c") - alpha
    y_r = F.col("ct") - F.col("c") + alpha
    n_r = (
        F.col("t") - F.col("ts") + _LO_ALPHA0 - (F.col("ct") - F.col("c")) - alpha
    )
    delta = F.log(y_s / n_s) - F.log(y_r / n_r)
    var = 1.0 / y_s + 1.0 / y_r
    z = j.select(
        "source",
        "tok",
        "c",
        F.round(delta, 5).alias("log_odds"),
        F.round(delta / F.sqrt(var), 5).alias("z_score"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("z_score"), "tok")
    return (
        z.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _LO_TOPK)
        .select("source", "tok", F.col("c").alias("c_source"), "log_odds", "z_score")
    )


# ---------------------------------------------------------------------------
# Chao1 vocabulary richness + Good's coverage (Chao 1984)
# ---------------------------------------------------------------------------


@register(
    "chao1_vocab_richness",
    """
    WITH toks AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    sc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2)
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab_obs,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS f1,
           CAST(count(CASE WHEN c = 2 THEN 1 END) AS BIGINT) AS f2,
           round(count(*)
                 + CAST(count(CASE WHEN c = 1 THEN 1 END) AS DOUBLE)
                   * (count(CASE WHEN c = 1 THEN 1 END) - 1)
                   / (2.0 * (count(CASE WHEN c = 2 THEN 1 END) + 1)), 2)
               AS chao1_est,
           round(1.0 - CAST(count(CASE WHEN c = 1 THEN 1 END) AS DOUBLE)
                       / sum(c), 5) AS good_coverage
    FROM sc GROUP BY 1
    """,
    tags=("X-chao1",),
)
def chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate of each source's TRUE vocabulary
    (Chao 1984, bias-corrected form V + F1(F1-1)/(2(F2+1))) plus Good's
    sample coverage 1 - F1/N (Good 1953): singletons F1 and doubletons
    F2 carry the information about unseen types, so a source whose
    chao1_est far exceeds vocab_obs is under-sampled — crawl it more
    before trusting its vocab_growth_by_source / heaps_law_loglog_fit
    extrapolations (Heaps fits the growth CURVE; Chao1 estimates the
    asymptote from one sample; Good-Turing — good_turing_bigram_smoothing
    — reallocates the same singleton mass to probabilities).

    Pure exact-integer frequency-of-frequency arithmetic with two
    rounded-ratio edges. Distributed shape: the shared (source, tok)
    count aggregation then a source-grain conditional-count rollup —
    map-side combined, no joins, no windows."""
    docs = table(spark, sf_dir, "documents")
    sc = (
        docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    f1 = F.count(F.when(F.col("c") == 1, 1)).cast("long")
    f2 = F.count(F.when(F.col("c") == 2, 1)).cast("long")
    v = F.count("*").cast("long")
    n = F.sum("c").cast("long")
    return sc.groupBy("source").agg(
        v.alias("vocab_obs"),
        n.alias("n_tokens"),
        f1.alias("f1"),
        f2.alias("f2"),
        F.round(
            v + f1.cast("double") * (f1 - F.lit(1)) / (2.0 * (f2 + F.lit(1))), 2
        ).alias("chao1_est"),
        F.round(1.0 - f1.cast("double") / n, 5).alias("good_coverage"),
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the mutual-kNN graph (Newman 2002)
# ---------------------------------------------------------------------------


def _assort_oracle() -> str:
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
    sym AS (
        SELECT a AS src, b AS dst FROM pairs
        UNION ALL
        SELECT b, a FROM pairs
    ),
    deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
    stubs AS (
        SELECT dj.d AS j, dk.d AS k
        FROM sym s JOIN deg dj ON s.src = dj.id JOIN deg dk ON s.dst = dk.id
    ),
    sums AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(j * k) AS BIGINT) AS sjk,
               CAST(sum(j) AS BIGINT) AS sj,
               CAST(sum(j * j) AS BIGINT) AS sjj
        FROM stubs
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(m / 2 AS BIGINT) AS n_edges,
           round(CAST(m AS DOUBLE) / (SELECT count(*) FROM deg), 4) AS mean_degree,
           round((m * CAST(sjk AS DOUBLE) - CAST(sj AS DOUBLE) * sj)
                 / (m * CAST(sjj AS DOUBLE) - CAST(sj AS DOUBLE) * sj), 6)
               AS assortativity
    FROM sums
    """


@register("knn_graph_assortativity", _assort_oracle(), tags=("X-assortativity",))
def knn_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the mutual-kNN embedding
    graph: the Pearson correlation of degrees across directed stubs
    (full-degree variant; each undirected edge contributes both
    orientations, so the j/k marginals coincide). The GLOBAL mixing
    number the local graph family cannot see — triangles/k-core/LPA
    describe neighborhoods; assortativity says whether hub vectors link
    to other hubs (r > 0: dense near-dup cores that LSH banding will
    bucket together) or to leaves (r < 0: hub-and-spoke, the pattern
    embedding_hubness_koccurrence flags at the node grain).

    Every moment is an exact integer sum over stubs (degrees are
    bounded by k-mutuality at 2k = 10, so products stay tiny); one
    rounded ratio at the edge. Distributed shape: the cell-restricted
    mutual-kNN edge build (see mutual_knn_pairs), one degree
    aggregation, two broadcast-sized degree joins onto the k-bounded
    stub frame, a single scalar rollup."""
    from .round6 import mutual_knn_pairs

    pairs = truncate_lineage(
        mutual_knn_pairs(spark, sf_dir).select(
            F.col("id_a").alias("a"), F.col("id_b").alias("b")
        ),
        eager=False,
    )  # both union branches read it
    sym = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    sym = truncate_lineage(sym, eager=False)  # degree agg + stub join read it
    deg = sym.groupBy("src").agg(F.count("*").cast("long").alias("d"))
    deg = truncate_lineage(deg, eager=False)  # joined twice + counted
    stubs = (
        sym.join(F.broadcast(deg.select(F.col("src").alias("src"), F.col("d").alias("j"))), "src")
        .join(
            F.broadcast(deg.select(F.col("src").alias("dst"), F.col("d").alias("k"))),
            "dst",
        )
    )
    sums = stubs.agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.col("j") * F.col("k")).cast("long").alias("sjk"),
        F.sum("j").cast("long").alias("sj"),
        F.sum(F.col("j") * F.col("j")).cast("long").alias("sjj"),
    )
    nn = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    return sums.crossJoin(F.broadcast(nn)).select(
        "n_nodes",
        (F.col("m") / 2).cast("long").alias("n_edges"),
        F.round(F.col("m").cast("double") / F.col("n_nodes"), 4).alias(
            "mean_degree"
        ),
        F.round(
            (F.col("m") * F.col("sjk").cast("double")
             - F.col("sj").cast("double") * F.col("sj"))
            / (F.col("m") * F.col("sjj").cast("double")
               - F.col("sj").cast("double") * F.col("sj")),
            6,
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Additive trend / day-of-week seasonal / remainder decomposition
# ---------------------------------------------------------------------------


@register(
    "stl_additive_decomposition",
    """
    WITH daily AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(dayofweek(min(ts)) AS INTEGER) AS dow,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
        FROM events GROUP BY 1
    ),
    ma AS (
        SELECT day, dow, yc,
               CAST(sum(yc) OVER w AS BIGINT) AS t7,
               CAST(count(*) OVER w AS BIGINT) AS c7
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detr AS (
        SELECT day, dow, yc,
               CASE WHEN c7 = 7 THEN t7 END AS t7v,
               CASE WHEN c7 = 7 THEN 7 * yc - t7 END AS d7
        FROM ma
    ),
    seas AS (
        SELECT dow, sum(CAST(d7 AS DOUBLE)) / (count(d7) * 700.0) AS m_dow
        FROM detr WHERE d7 IS NOT NULL GROUP BY 1
    ),
    grand AS (SELECT sum(m_dow) / 7.0 AS g FROM seas),
    centered AS (
        SELECT s.dow, round(s.m_dow - g.g, 4) AS seasonal
        FROM seas s CROSS JOIN grand g
    )
    SELECT d.day, d.dow,
           round(d.yc / 100.0, 2) AS y,
           round(CAST(d.t7v AS DOUBLE) / 700.0, 4) AS trend,
           c.seasonal,
           round(d.yc / 100.0 - round(CAST(d.t7v AS DOUBLE) / 700.0, 4)
                 - c.seasonal, 4) AS remainder
    FROM detr d JOIN centered c USING (dow)
    """,
    tags=("X-stl",),
)
def stl_additive_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily event volume (the
    moving-average decomposition STL refines): trend = centered 7-day
    moving average (defined only where the full window exists), seasonal
    = day-of-week mean of the detrended series centered to sum zero,
    remainder = what's left — the series cusum_changepoint / EWMA / SAX
    SHOULD consume instead of raw volume (a Saturday dip is not a
    changepoint). Completes the time-series family's decomposition gap:
    seasonal_baseline_profile indexes the raw weekly profile;
    this separates trend from season so each is interpretable alone.

    Exactness: daily totals are exact cent integers; the MA numerator
    and the detrended series 7*y - sum7(y) stay exact integers (units
    of 1/7 cent) through the windows, going double only at the
    per-weekday mean; remainder recomposes from the ROUNDED trend and
    seasonal so all three published columns satisfy y = trend +
    seasonal + remainder bit-for-bit. DuckDB's dayofweek is 0=Sunday,
    Spark's is 1=Sunday — the Spark side subtracts 1 (the
    seasonal_baseline_profile alignment). Distributed shape: one
    day-grain aggregation, day-count-bounded windows and a 7-row
    seasonal frame — nothing data-grain after the first rollup."""
    ev = table(spark, sf_dir, "events")
    # r14 checkpoint audit: daily feeds only ma -> detr, and detr is
    # checkpointed — daily's own checkpoint was a redundant write+read
    # inside detr's one-time materialization, dropped.
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        (F.dayofweek(F.min("ts")) - 1).cast("int").alias("dow"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("yc"),
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "dow",
        "yc",
        F.sum("yc").over(w7).cast("long").alias("t7"),
        F.count("*").over(w7).cast("long").alias("c7"),
    )
    detr = truncate_lineage(
        ma.select(
            "day",
            "dow",
            "yc",
            F.when(F.col("c7") == 7, F.col("t7")).alias("t7v"),
            F.when(F.col("c7") == 7, 7 * F.col("yc") - F.col("t7")).alias("d7"),
        ),
        eager=False,
    )  # seasonal means and the final projection both read it
    seas = (
        detr.filter(F.col("d7").isNotNull())
        .groupBy("dow")
        .agg(
            (F.sum(F.col("d7").cast("double")) / (F.count("d7") * 700.0)).alias(
                "m_dow"
            )
        )
    )
    grand = seas.agg((F.sum("m_dow") / 7.0).alias("g"))
    centered = seas.crossJoin(F.broadcast(grand)).select(
        "dow", F.round(F.col("m_dow") - F.col("g"), 4).alias("seasonal")
    )
    trend = F.round(F.col("t7v").cast("double") / 700.0, 4)
    return detr.join(F.broadcast(centered), "dow").select(
        "day",
        "dow",
        F.round(F.col("yc") / 100.0, 2).alias("y"),
        trend.alias("trend"),
        "seasonal",
        F.round(F.col("yc") / 100.0 - trend - F.col("seasonal"), 4).alias(
            "remainder"
        ),
    )


# ---------------------------------------------------------------------------
# Rank-biased overlap between two document rankings (Webber et al. 2010)
# ---------------------------------------------------------------------------

_RBO_P = 0.9
_RBO_DEPTH = 50


def _rbo_oracle() -> str:
    return f"""
    WITH dtc AS (
        SELECT doc_id, n_chars,
               CAST(count(DISTINCT tok) AS BIGINT) AS n_types
        FROM (SELECT doc_id, n_chars,
                     unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
        GROUP BY 1, 2
    ),
    ra AS (
        SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS pos_a
        FROM dtc QUALIFY pos_a <= {_RBO_DEPTH}
    ),
    rb AS (
        SELECT doc_id, row_number() OVER (ORDER BY n_types DESC, doc_id) AS pos_b
        FROM dtc QUALIFY pos_b <= {_RBO_DEPTH}
    ),
    joined AS (  -- "both" is a DuckDB keyword
        SELECT greatest(ra.pos_a, rb.pos_b) AS m
        FROM ra JOIN rb USING (doc_id)
    ),
    grid AS (
        SELECT unnest(generate_series(1, {_RBO_DEPTH})) AS depth
    ),
    counts AS (
        SELECT g.depth,
               CAST((SELECT count(*) FROM joined b WHERE b.m <= g.depth) AS BIGINT)
                   AS overlap_count
        FROM grid g
    ),
    terms AS (
        SELECT depth, overlap_count,
               CAST(round(1000000000000.0 * (1 - {_RBO_P})
                          * power({_RBO_P}, depth - 1)
                          * overlap_count / depth) AS BIGINT) AS t_mu
        FROM counts
    )
    SELECT depth, overlap_count,
           round(CAST(overlap_count AS DOUBLE) / depth, 6) AS agreement,
           round(CAST(sum(t_mu) OVER (ORDER BY depth
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / 1000000000000.0, 6) AS rbo_at_depth
    FROM terms
    """


@register("rank_biased_overlap", _rbo_oracle(), tags=("X-rbo",))
def rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010, p = 0.9,
    truncated at depth 50) between two document rankings — by raw length
    and by distinct-type count: the TOP-WEIGHTED agreement measure for
    indefinite rankings that quality_metric_spearman cannot provide
    (Spearman weights rank 1 and rank 10,000 equally and needs conjoint
    lists; RBO's geometric weights make the head dominate and tolerate
    non-overlap). Per-depth rows expose the full convergence curve:
    agreement@d is the raw set overlap fraction, rbo_at_depth the
    weighted prefix sum an IR evaluation would quote.

    Overlap counts come from max(pos_a, pos_b): |A_d ∩ B_d| =
    #{doc: max positions <= d} — one join of the two top-k frames, no
    per-depth set intersection. Each RBO term becomes a pico-unit
    integer before the prefix sum (power() ulp divergence is absorbed
    by the rounding), so the running sum is exact. Distributed shape:
    one doc-grain distinct-type aggregation, two TakeOrderedAndProject
    top-{_RBO_DEPTH} sorts (never a global data-grain window), then all
    work on <= 2*{_RBO_DEPTH} rows against a static depth grid."""
    docs = table(spark, sf_dir, "documents")
    dtc = truncate_lineage(
        docs.select(
            "doc_id",
            "n_chars",
            F.explode(F.split(F.lower("text"), " ")).alias("tok"),
        )
        .groupBy("doc_id", "n_chars")
        .agg(F.count_distinct("tok").cast("long").alias("n_types")),
        eager=False,
    )  # both top-k sorts read it
    top_a = dtc.orderBy(F.desc("n_chars"), "doc_id").limit(_RBO_DEPTH)
    top_b = dtc.orderBy(F.desc("n_types"), "doc_id").limit(_RBO_DEPTH)
    ra = top_a.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("n_chars"), "doc_id"))
        .alias("pos_a"),
    )
    rb = top_b.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("n_types"), "doc_id"))
        .alias("pos_b"),
    )
    both = ra.join(rb, "doc_id").select(
        F.greatest("pos_a", "pos_b").alias("m")
    )
    grid = spark.range(1, _RBO_DEPTH + 1).select(
        F.col("id").cast("int").alias("depth")
    )
    counts = (
        grid.join(
            F.broadcast(
                both.groupBy("m").agg(F.count("*").cast("long").alias("cm"))
            ),
            grid.depth >= F.col("m"),
            "left",
        )
        .groupBy("depth")
        .agg(F.coalesce(F.sum("cm"), F.lit(0)).cast("long").alias("overlap_count"))
    )
    t_mu = F.round(
        1000000000000.0
        * (1 - _RBO_P)
        * F.pow(F.lit(_RBO_P), F.col("depth") - 1)
        * F.col("overlap_count")
        / F.col("depth"),
        0,
    ).cast("long")
    return (
        counts.withColumn("t_mu", t_mu)
        .select(
            "depth",
            "overlap_count",
            F.round(F.col("overlap_count").cast("double") / F.col("depth"), 6).alias(
                "agreement"
            ),
            F.round(
                F.sum("t_mu")
                .over(
                    Window.orderBy("depth").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                )
                .cast("double")
                / 1000000000000.0,
                6,
            ).alias("rbo_at_depth"),
        )
    )
