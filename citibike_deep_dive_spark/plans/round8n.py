"""Round-8 continuation batch 12: retrieval feedback and time-series
inference — Rocchio pseudo-relevance query expansion (Rocchio 1971, the
classical feedback loop on top of bm25_doc_scores: what terms should
the NEXT query add), lagged cross-correlation between the click and
view daily series (the PAIR member of the time-series family —
autocorrelation sees one series' memory, CCF sees which series LEADS),
the Mann–Kendall trend test with tie-corrected variance (Mann 1945;
Kendall 1975 — the nonparametric significance test for the monotone
trend theil_sen_trend only estimates a slope for), and the Haar wavelet
energy decomposition of daily volume (Haar 1910 — multi-RESOLUTION
energy localization, the complement to daily_volume_fourier's
frequency-only view; Parseval ties the level energies back to the raw
sum of squares exactly).

Engine-exactness: Rocchio per-document term weights become micro-unit
integers before the relevance-set sum; CCF/Mann–Kendall/Haar run on
exact integer day aggregates with sign/pair/difference arithmetic
staying integral until one rounded edge per published column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table

# ---------------------------------------------------------------------------
# Rocchio pseudo-relevance feedback query expansion (Rocchio 1971)
# ---------------------------------------------------------------------------

_ROCCHIO_TOPDOCS = 10
_ROCCHIO_TOPK = 15
_ROCCHIO_BETA = 0.75


def _rocchio_oracle() -> str:
    from .training import _BM25_TERMS, _bm25_oracle

    exclude = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH scores AS (SELECT * FROM ({_bm25_oracle()}) s),
    top_docs AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
            FROM scores
        ) WHERE rn <= {_ROCCHIO_TOPDOCS}
    ),
    corpus AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    dfreq AS (
        SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM corpus
        GROUP BY 1
    ),
    n_docs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    rel_tf AS (
        SELECT c.doc_id, c.tok, CAST(count(*) AS BIGINT) AS tf
        FROM corpus c JOIN top_docs USING (doc_id)
        GROUP BY 1, 2
    ),
    weighted AS (  -- per-(doc, term) tf-idf weight, micro-unit exact
        SELECT r.tok, r.doc_id, d.df,
               CAST(round(1000000.0 * r.tf * ln(1.0 + CAST(n.n AS DOUBLE) / d.df))
                    AS BIGINT) AS w_mu
        FROM rel_tf r JOIN dfreq d USING (tok) CROSS JOIN n_docs n
    ),
    centroid AS (
        SELECT tok, CAST(max(df) AS BIGINT) AS df,
               CAST(count(*) AS BIGINT) AS rel_docs,
               CAST(sum(w_mu) AS BIGINT) AS sum_mu
        FROM weighted
        WHERE tok NOT IN ({exclude})
        GROUP BY 1
    )
    SELECT tok AS term, df, rel_docs,
           round({_ROCCHIO_BETA} * sum_mu
                 / ({_ROCCHIO_TOPDOCS} * 1000000.0), 6) AS rocchio_weight,
           CAST(row_number() OVER (ORDER BY sum_mu DESC, tok) AS BIGINT) AS rank
    FROM centroid
    QUALIFY rank <= {_ROCCHIO_TOPK}
    """


@register("rocchio_query_expansion", _rocchio_oracle(), tags=("X-rocchio",))
def rocchio_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance feedback (Rocchio 1971, beta-term only —
    the original terms are the query itself and there are no judged
    non-relevant docs in PRF): take the BM25 top-10 for the fixed query,
    build the tf-idf centroid of those documents, and emit the top-15
    NEW terms the expanded query should add — the classical feedback
    loop completing the retrieval family (bm25 scores, rrf fuses, MMR
    diversifies, NDCG grades; Rocchio is how the query itself learns).

    Per-(doc, term) weights tf * ln(1 + N/df) become micro-unit
    INTEGERS before the relevance-set sum, and the expansion ranking
    orders by that exact integer with a term tiebreak. The relevance
    set ranks by the 4dp-ROUNDED bm25 with doc_id tiebreak (both
    engines pick identical docs). Distributed shape: the linear bm25
    scan, one TakeOrderedAndProject top-10, corpus df aggregation
    (Heaps-bounded), then all centroid work on 10 documents' terms."""
    from .training import _BM25_TERMS, bm25_doc_scores

    scores = bm25_doc_scores(spark, sf_dir)
    top_docs = scores.orderBy(F.desc("bm25"), "doc_id").limit(_ROCCHIO_TOPDOCS).select(
        "doc_id"
    )
    docs = table(spark, sf_dir, "documents")
    corpus = truncate_lineage(
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        ),
        eager=False,
    )  # df aggregation and the relevance-set tf both read it
    dfreq = corpus.groupBy("tok").agg(
        F.count_distinct("doc_id").cast("long").alias("df")
    )
    n_docs = docs.agg(F.count("*").cast("long").alias("n"))
    rel_tf = (
        corpus.join(F.broadcast(top_docs), "doc_id")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    weighted = (
        rel_tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok",
            "df",
            F.round(
                1000000.0
                * F.col("tf")
                * F.log(1.0 + F.col("n").cast("double") / F.col("df")),
                0,
            )
            .cast("long")
            .alias("w_mu"),
        )
    )
    centroid = (
        weighted.filter(~F.col("tok").isin(*_BM25_TERMS))
        .groupBy("tok")
        .agg(
            F.max("df").cast("long").alias("df"),
            F.count("*").cast("long").alias("rel_docs"),
            F.sum("w_mu").cast("long").alias("sum_mu"),
        )
    )
    return (
        centroid.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("sum_mu"), "tok")).cast("long"),
        )
        .filter(F.col("rank") <= _ROCCHIO_TOPK)
        .select(
            F.col("tok").alias("term"),
            "df",
            "rel_docs",
            F.round(
                _ROCCHIO_BETA * F.col("sum_mu") / (_ROCCHIO_TOPDOCS * 1000000.0), 6
            ).alias("rocchio_weight"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Lagged cross-correlation between click and view daily counts
# ---------------------------------------------------------------------------

_CCF_MAXLAG = 7


def _ccf_oracle() -> str:
    return f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS x,
               CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS DOUBLE) / count(*) AS xbar,
               CAST(sum(y) AS DOUBLE) / count(*) AS ybar,
               sqrt(CAST(sum(x * x) AS DOUBLE) / count(*)
                    - (CAST(sum(x) AS DOUBLE) / count(*))
                      * (CAST(sum(x) AS DOUBLE) / count(*))) AS sx,
               sqrt(CAST(sum(y * y) AS DOUBLE) / count(*)
                    - (CAST(sum(y) AS DOUBLE) / count(*))
                      * (CAST(sum(y) AS DOUBLE) / count(*))) AS sy
        FROM daily
    ),
    lags AS (SELECT unnest(generate_series(-{_CCF_MAXLAG}, {_CCF_MAXLAG})) AS lag),
    pairs AS (
        SELECT l.lag, a.x, b.y
        FROM lags l
        JOIN daily a ON true
        JOIN daily b ON b.day = a.day + l.lag * INTERVAL 1 DAY
    )
    SELECT p.lag,
           CAST(count(*) AS BIGINT) AS n_overlap,
           round(sum((p.x - s.xbar) * (p.y - s.ybar)) / (s.n * s.sx * s.sy), 5)
               AS ccf
    FROM pairs p CROSS JOIN stats s
    GROUP BY p.lag, s.n, s.sx, s.sy
    """


@register("cross_correlation_lagged", _ccf_oracle(), tags=("X-ccf",))
def cross_correlation_lagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation (the sample CCF, full-series
    normalization) between the click and view daily-count series at
    lags -7..+7: ccf(l) = sum_t (x_t - xbar)(y_{t+l} - ybar) / (n sx sy)
    — the PAIR member of the time-series family: autocorrelation
    (daily_count_autocorrelation) sees one series' memory, CCF sees
    whether views LEAD clicks (peak at positive lag) or the reverse —
    the lead/lag sign an attribution or forecasting model needs before
    it regresses one series on the other.

    Daily counts are exact integers; means/sds are ratios of exact
    sums, so both engines walk identical doubles into one 5dp edge.
    Distributed shape: one day-grain aggregation (the only data-grain
    pass), then a 15-lag x days self-join on the DAY-GRAIN frame —
    bounded by calendar size, not data size, at any corpus scale."""
    ev = table(spark, sf_dir, "events")
    daily = truncate_lineage(
        ev.groupBy(F.to_date("ts").alias("day")).agg(
            F.count(F.when(F.col("event_type") == "click", 1))
            .cast("long")
            .alias("x"),
            F.count(F.when(F.col("event_type") == "view", 1))
            .cast("long")
            .alias("y"),
        ),
        eager=False,
    )  # stats + both sides of the lag join read it
    n = F.count("*").cast("long")
    sx_ = F.sum("x").cast("double")
    sy_ = F.sum("y").cast("double")
    sxx = F.sum(F.col("x") * F.col("x")).cast("double")
    syy = F.sum(F.col("y") * F.col("y")).cast("double")
    stats = daily.agg(
        n.alias("n"),
        (sx_ / n).alias("xbar"),
        (sy_ / n).alias("ybar"),
        F.sqrt(sxx / n - (sx_ / n) * (sx_ / n)).alias("sx"),
        F.sqrt(syy / n - (sy_ / n) * (sy_ / n)).alias("sy"),
    )
    lags = spark.range(-_CCF_MAXLAG, _CCF_MAXLAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select(F.col("day").alias("day_a"), "x")
    b = daily.select(F.col("day").alias("day_b"), "y")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("day_b") == F.date_add(F.col("day_a"), F.col("lag")))
    )
    return (
        pairs.crossJoin(F.broadcast(stats))
        .groupBy("lag", "n", "sx", "sy")
        .agg(
            F.count("*").cast("long").alias("n_overlap"),
            F.round(
                F.sum((F.col("x") - F.col("xbar")) * (F.col("y") - F.col("ybar")))
                / (F.col("n") * F.col("sx") * F.col("sy")),
                5,
            ).alias("ccf"),
        )
        .select("lag", "n_overlap", "ccf")
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test with tie correction (Mann 1945; Kendall 1975)
# ---------------------------------------------------------------------------


@register(
    "mann_kendall_trend",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(sum(CASE WHEN b.yc > a.yc THEN 1
                             WHEN b.yc < a.yc THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat
        FROM daily a JOIN daily b ON a.day < b.day
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
    ties AS (
        SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                   AS tie_term
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY yc)
        WHERE t > 1
    )
    SELECT nn.n AS n_days, s.s_stat,
           round((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term) / 18.0, 4)
               AS var_s,
           round(CASE
               WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                   / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term)
                          / 18.0)
               WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                   / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term)
                          / 18.0)
               ELSE 0.0 END, 5) AS z_stat,
           CASE WHEN s.s_stat > 0 THEN 'increasing'
                WHEN s.s_stat < 0 THEN 'decreasing'
                ELSE 'none' END AS trend
    FROM s CROSS JOIN nn CROSS JOIN ties
    """,
    tags=("X-mann-kendall",),
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test (Mann 1945; Kendall 1975) on daily
    revenue with the tie-corrected variance and continuity-corrected z
    — the nonparametric SIGNIFICANCE test for a monotone trend:
    theil_sen_trend estimates how steep the trend is, Mann–Kendall says
    whether it exists at all (S counts concordant minus discordant day
    pairs; no distributional assumption, robust to the spikes that
    wreck an OLS t-test). The standard pairing in environmental/ops
    monitoring: MK for detection, Theil–Sen for magnitude.

    S and the tie term are exact integer pair/group counts; variance
    and z take one rounded-double edge each. Distributed shape: one
    day-grain aggregation, then an O(days^2) self-join on the DAY-GRAIN
    frame — bounded by calendar size (30 rows here, ~36.5k pairs even
    for a decade), never by corpus size."""
    ev = table(spark, sf_dir, "events")
    daily = truncate_lineage(
        ev.groupBy(F.to_date("ts").alias("day")).agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("yc")
        ),
        eager=False,
    )  # pair join (both sides), n, and tie groups all read it
    a, b = daily.alias("a"), daily.alias("b")
    s = a.join(b, F.col("a.day") < F.col("b.day")).agg(
        F.sum(
            F.when(F.col("b.yc") > F.col("a.yc"), 1)
            .when(F.col("b.yc") < F.col("a.yc"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s_stat")
    )
    nn = daily.agg(F.count("*").cast("long").alias("n"))
    ties = (
        daily.groupBy("yc")
        .agg(F.count("*").cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(nn)).crossJoin(F.broadcast(ties))
    var_raw = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ) / 18.0
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_raw))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_raw))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        F.col("n").alias("n_days"),
        "s_stat",
        F.round(var_raw, 4).alias("var_s"),
        F.round(z, 5).alias("z_stat"),
        F.when(F.col("s_stat") > 0, "increasing")
        .when(F.col("s_stat") < 0, "decreasing")
        .otherwise("none")
        .alias("trend"),
    )


# ---------------------------------------------------------------------------
# Haar wavelet energy decomposition of daily volume (Haar 1910)
# ---------------------------------------------------------------------------

_HAAR_DAYS = 16  # dyadic window: first 2^4 days


def _haar_oracle() -> str:
    # level l coefficients pair adjacent level-(l-1) approximations;
    # detail energy at level l = sum(diff^2) / 2^l in exact cents^2
    return f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
        FROM events GROUP BY 1
    ),
    base AS (
        SELECT yc, row_number() OVER (ORDER BY day) - 1 AS idx
        FROM daily QUALIFY idx < {_HAAR_DAYS}
    ),
    l1 AS (
        SELECT idx // 2 AS idx,
               CAST(sum(CASE WHEN idx % 2 = 0 THEN yc ELSE 0 END)
                  - sum(CASE WHEN idx % 2 = 1 THEN yc ELSE 0 END) AS BIGINT) AS d,
               CAST(sum(yc) AS BIGINT) AS a
        FROM base GROUP BY 1
    ),
    l2 AS (
        SELECT idx // 2 AS idx,
               CAST(sum(CASE WHEN idx % 2 = 0 THEN a ELSE 0 END)
                  - sum(CASE WHEN idx % 2 = 1 THEN a ELSE 0 END) AS BIGINT) AS d,
               CAST(sum(a) AS BIGINT) AS a
        FROM l1 GROUP BY 1
    ),
    l3 AS (
        SELECT idx // 2 AS idx,
               CAST(sum(CASE WHEN idx % 2 = 0 THEN a ELSE 0 END)
                  - sum(CASE WHEN idx % 2 = 1 THEN a ELSE 0 END) AS BIGINT) AS d,
               CAST(sum(a) AS BIGINT) AS a
        FROM l2 GROUP BY 1
    ),
    l4 AS (
        SELECT idx // 2 AS idx,
               CAST(sum(CASE WHEN idx % 2 = 0 THEN a ELSE 0 END)
                  - sum(CASE WHEN idx % 2 = 1 THEN a ELSE 0 END) AS BIGINT) AS d,
               CAST(sum(a) AS BIGINT) AS a
        FROM l3 GROUP BY 1
    ),
    energies AS (  -- scaled by 16/2^l so every row is an exact integer
        SELECT 1 AS level, CAST(count(*) AS BIGINT) AS n_coeffs,
               CAST(sum(CAST(d AS HUGEINT) * d) * 8 AS HUGEINT) AS e16
        FROM l1
        UNION ALL
        SELECT 2, CAST(count(*) AS BIGINT),
               CAST(sum(CAST(d AS HUGEINT) * d) * 4 AS HUGEINT) FROM l2
        UNION ALL
        SELECT 3, CAST(count(*) AS BIGINT),
               CAST(sum(CAST(d AS HUGEINT) * d) * 2 AS HUGEINT) FROM l3
        UNION ALL
        SELECT 4, CAST(count(*) AS BIGINT),
               CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) FROM l4
        UNION ALL
        SELECT 0, CAST(count(*) AS BIGINT),
               CAST(sum(CAST(a AS HUGEINT) * a) AS HUGEINT) FROM l4
    ),
    tot AS (SELECT CAST(sum(e16) AS HUGEINT) AS t16 FROM energies)
    SELECT level, n_coeffs,
           round(CAST(e16 AS DOUBLE) / 16.0 / 10000.0, 4) AS energy,
           round(CAST(e16 AS DOUBLE) / CAST(tot.t16 AS DOUBLE), 5) AS energy_share
    FROM energies CROSS JOIN tot
    """


@register("haar_wavelet_energy", _haar_oracle(), tags=("X-haar",))
def haar_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy decomposition of the first 16 days of daily
    revenue: detail energy per dyadic level (1 = day-to-day, 2 =
    pair-to-pair, ... 4 = week-to-week) plus the level-4 approximation
    (level 0 row) — multi-RESOLUTION energy localization, the
    complement to daily_volume_fourier (Fourier says WHICH frequencies
    carry energy, Haar says WHERE in time the variation lives: a single
    spiky day loads level 1; a regime shift mid-window loads level 4).
    Parseval holds exactly: the five energies sum to the raw sum of
    squares, which the test pins.

    All coefficients are exact integer sums/differences of cent
    integers; per-level energies are scaled by 16/2^l so every
    intermediate is an exact (HUGEINT/decimal) integer and only the two
    published ratios round. Distributed shape: one day-grain
    aggregation, then four unrolled pairing aggregations on <= 16 rows
    — calendar-bounded, like the Fourier grid."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("yc")
    )
    base = (
        daily.orderBy("day")
        .limit(_HAAR_DAYS)
        .select(
            "yc",
            (F.row_number().over(Window.orderBy("day")) - 1).alias("idx"),
        )
    )
    levels = []
    cur = base.select("idx", F.col("yc").alias("a"))
    for lvl, scale in ((1, 8), (2, 4), (3, 2), (4, 1)):
        nxt = cur.groupBy((F.col("idx") / 2).cast("int").alias("idx")).agg(
            (
                F.sum(F.when(F.col("idx") % 2 == 0, F.col("a")).otherwise(0))
                - F.sum(F.when(F.col("idx") % 2 == 1, F.col("a")).otherwise(0))
            )
            .cast("long")
            .alias("d"),
            F.sum("a").cast("long").alias("a"),
        )
        nxt = truncate_lineage(nxt, eager=False)  # consumed by next level + energy
        levels.append(
            nxt.agg(
                F.lit(lvl).cast("int").alias("level"),
                F.count("*").cast("long").alias("n_coeffs"),
                (F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")) * scale)
                .cast("decimal(38,0)")
                .alias("e16"),
            )
        )
        cur = nxt
    levels.append(
        cur.agg(
            F.lit(0).cast("int").alias("level"),
            F.count("*").cast("long").alias("n_coeffs"),
            F.sum(F.col("a").cast("decimal(38,0)") * F.col("a"))
            .cast("decimal(38,0)")
            .alias("e16"),
        )
    )
    energies = levels[0]
    for lv in levels[1:]:
        energies = energies.unionByName(lv)
    energies = truncate_lineage(energies, eager=False)  # total re-aggregates it
    tot = energies.agg(F.sum("e16").cast("decimal(38,0)").alias("t16"))
    return energies.crossJoin(F.broadcast(tot)).select(
        "level",
        "n_coeffs",
        F.round(F.col("e16").cast("double") / 16.0 / 10000.0, 4).alias("energy"),
        F.round(F.col("e16").cast("double") / F.col("t16").cast("double"), 5).alias(
            "energy_share"
        ),
    )
