"""Round-8 continuation batch 13: nonlinear dependence, query
difficulty, causal estimation, and survey calibration — distance
correlation between the click and view daily series (Székely, Rizzo &
Bakirov 2007 — zero iff INDEPENDENT, the dependence measure Pearson/
Spearman/CCF cannot deliver), the Clarity query-performance predictor
(Cronen-Townsend, Zhou & Croft 2002 — KL divergence of the top-10
result language model from the corpus: how focused is a query BEFORE a
human grades it), an inverse-propensity-weighted ATE with stratified
propensities (Horvitz & Thompson 1952 / Rosenbaum & Rubin 1983 — the
observational-causal member next to CUPED's experimental adjustment),
a difference-in-differences estimate on the hash-split arms (Card &
Krueger 1994 form — the panel-data causal design), and two rounds of
iterative proportional fitting for raking weights to uniform
lang x source margins (Deming & Stephan 1940 — survey calibration, the
weighting view of what temperature_source_mix does by sampling).

Engine-exactness: every statistic is built from exact integer cell/
pair sums; IPF weights are re-quantized to micro-units after each
scaling step so both engines iterate identical values; IPW buckets
with degenerate propensity (0 or 1) are excluded deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from ..functions.portable import portable_hash64, portable_hash64_sql
from ..functions.timeutil import ts_micros
from .catalog import register, table

# ---------------------------------------------------------------------------
# Distance correlation between daily click and view counts (Székely 2007)
# ---------------------------------------------------------------------------


def _dcor_oracle() -> str:
    return """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS x,
               CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
    pairs AS (
        SELECT a.day AS di, b.day AS dj,
               CAST(abs(a.x - b.x) AS BIGINT) AS ax,
               CAST(abs(a.y - b.y) AS BIGINT) AS ay
        FROM daily a CROSS JOIN daily b
    ),
    rowm AS (
        SELECT di, CAST(sum(ax) AS BIGINT) AS rx, CAST(sum(ay) AS BIGINT) AS ry
        FROM pairs GROUP BY 1
    ),
    colm AS (
        SELECT dj, CAST(sum(ax) AS BIGINT) AS cx, CAST(sum(ay) AS BIGINT) AS cy
        FROM pairs GROUP BY 1
    ),
    grand AS (
        SELECT CAST(sum(ax) AS BIGINT) AS gx, CAST(sum(ay) AS BIGINT) AS gy
        FROM pairs
    ),
    centered AS (
        SELECT (p.ax - CAST(r.rx AS DOUBLE) / n.n - CAST(c.cx AS DOUBLE) / n.n
                + CAST(g.gx AS DOUBLE) / (n.n * n.n)) AS axc,
               (p.ay - CAST(r.ry AS DOUBLE) / n.n - CAST(c.cy AS DOUBLE) / n.n
                + CAST(g.gy AS DOUBLE) / (n.n * n.n)) AS ayc
        FROM pairs p
        JOIN rowm r USING (di) JOIN colm c USING (dj)
        CROSS JOIN grand g CROSS JOIN nn n
    ),
    moments AS (
        SELECT sum(axc * ayc) AS vxy, sum(axc * axc) AS vxx,
               sum(ayc * ayc) AS vyy
        FROM centered
    )
    SELECT nn.n AS n_days,
           round(m.vxy / (nn.n * nn.n), 5) AS dcov2,
           round(CASE WHEN m.vxx * m.vyy = 0 THEN 0.0
                 ELSE sqrt(m.vxy / sqrt(m.vxx * m.vyy)) END, 5) AS dcor
    FROM moments m CROSS JOIN nn
    """


@register("distance_correlation_daily", _dcor_oracle(), tags=("X-dcor",))
def distance_correlation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance correlation (Székely, Rizzo & Bakirov 2007) between the
    click and view daily-count series: double-centered pairwise
    distance matrices, dCor = sqrt(dCov^2 / sqrt(dVarX dVarY)) — the
    dependence measure that is ZERO IFF the series are independent,
    catching the U-shaped / nonlinear coupling Pearson (lag-0 CCF) and
    Spearman both score as ~0. The third member of the dependence
    family: CCF for linear lead/lag, mutual information for coarse
    categorical coupling, dCor for arbitrary continuous dependence.

    Pairwise distances are exact integers; row/column/grand means are
    ratios of exact sums, so both engines center identically and only
    the two published values round. Distributed shape: one day-grain
    aggregation, then an O(days^2) pair frame with day-grain margin
    joins — calendar-bounded (900 pairs for a month, ~13M for a
    decade), never corpus-bounded."""
    ev = table(spark, sf_dir, "events")
    daily = truncate_lineage(
        ev.groupBy(F.to_date("ts").alias("day")).agg(
            F.count(F.when(F.col("event_type") == "click", 1)).cast("long").alias("x"),
            F.count(F.when(F.col("event_type") == "view", 1)).cast("long").alias("y"),
        ),
        eager=False,
    )
    nn = daily.agg(F.count("*").cast("long").alias("n"))
    a = daily.select(F.col("day").alias("di"), F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = daily.select(F.col("day").alias("dj"), F.col("x").alias("xj"), F.col("y").alias("yj"))
    pairs = truncate_lineage(
        a.crossJoin(b).select(
            "di",
            "dj",
            F.abs(F.col("xi") - F.col("xj")).cast("long").alias("ax"),
            F.abs(F.col("yi") - F.col("yj")).cast("long").alias("ay"),
        ),
        eager=False,
    )  # margins and the centered frame all read it
    rowm = pairs.groupBy("di").agg(
        F.sum("ax").cast("long").alias("rx"), F.sum("ay").cast("long").alias("ry")
    )
    colm = pairs.groupBy("dj").agg(
        F.sum("ax").cast("long").alias("cx"), F.sum("ay").cast("long").alias("cy")
    )
    grand = pairs.agg(
        F.sum("ax").cast("long").alias("gx"), F.sum("ay").cast("long").alias("gy")
    )
    n = F.col("n")
    axc = (
        F.col("ax")
        - F.col("rx").cast("double") / n
        - F.col("cx").cast("double") / n
        + F.col("gx").cast("double") / (n * n)
    )
    ayc = (
        F.col("ay")
        - F.col("ry").cast("double") / n
        - F.col("cy").cast("double") / n
        + F.col("gy").cast("double") / (n * n)
    )
    moments = (
        pairs.join(rowm, "di")
        .join(colm, "dj")
        .crossJoin(F.broadcast(grand))
        .crossJoin(F.broadcast(nn))
        .agg(
            F.sum(axc * ayc).alias("vxy"),
            F.sum(axc * axc).alias("vxx"),
            F.sum(ayc * ayc).alias("vyy"),
            F.max("n").alias("n"),
        )
    )
    return moments.select(
        F.col("n").alias("n_days"),
        F.round(F.col("vxy") / (F.col("n") * F.col("n")), 5).alias("dcov2"),
        F.round(
            F.when(F.col("vxx") * F.col("vyy") == 0, F.lit(0.0)).otherwise(
                F.sqrt(F.col("vxy") / F.sqrt(F.col("vxx") * F.col("vyy")))
            ),
            5,
        ).alias("dcor"),
    )


# ---------------------------------------------------------------------------
# Clarity score: query-performance prediction (Cronen-Townsend 2002)
# ---------------------------------------------------------------------------

_CLARITY_TOPDOCS = 10
_CLARITY_LAMBDA = 0.6
_CLARITY_TOPK = 10


def _clarity_oracle() -> str:
    from .training import _bm25_oracle

    return f"""
    WITH scores AS (SELECT * FROM ({_bm25_oracle()}) s),
    top_docs AS (
        SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
            FROM scores
        ) WHERE rn <= {_CLARITY_TOPDOCS}
    ),
    corpus AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    ccount AS (SELECT tok, CAST(count(*) AS BIGINT) AS ct FROM corpus GROUP BY 1),
    ctot AS (SELECT CAST(sum(ct) AS BIGINT) AS t FROM ccount),
    rel AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS rc
        FROM corpus JOIN top_docs USING (doc_id) GROUP BY 1
    ),
    rtot AS (SELECT CAST(sum(rc) AS BIGINT) AS rt FROM rel),
    terms AS (  -- JM-smoothed top-docs LM vs corpus LM, log2 contributions
        SELECT r.tok, r.rc, k.ct,
               ({_CLARITY_LAMBDA} * r.rc / rt.rt
                + {1 - _CLARITY_LAMBDA} * k.ct / x.t) AS p_top,
               CAST(k.ct AS DOUBLE) / x.t AS p_corpus
        FROM rel r
        JOIN ccount k USING (tok)
        CROSS JOIN rtot rt CROSS JOIN ctot x
    ),
    contrib AS (
        SELECT tok, rc, ct,
               round(p_top * log2(p_top / p_corpus), 6) AS kl_term
        FROM terms
    ),
    clarity AS (SELECT round(sum(kl_term), 5) AS clarity FROM contrib)
    SELECT tok AS term, rc AS rel_count, ct AS corpus_count, kl_term,
           c.clarity,
           CAST(row_number() OVER (ORDER BY kl_term DESC, tok) AS BIGINT) AS rank
    FROM contrib CROSS JOIN clarity c
    QUALIFY rank <= {_CLARITY_TOPK}
    """


@register("clarity_score_qpp", _clarity_oracle(), tags=("X-clarity",))
def clarity_score_qpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clarity score (Cronen-Townsend, Zhou & Croft 2002): the KL
    divergence (in bits) of the Jelinek-Mercer-smoothed language model
    of the BM25 top-10 from the corpus language model — query
    performance PREDICTION: a focused query's result set speaks a
    distinctive sub-language (high clarity), an ambiguous query's top
    docs look like the corpus (clarity ~ 0). The pre-retrieval
    complement to NDCG/MAP-style POST-hoc grading, and the second
    consumer of the bm25 relevance set after rocchio_query_expansion
    (Rocchio says WHICH terms to add; Clarity says whether retrieval is
    working at all). Rows are the top-10 KL-contributing terms — the
    query's effective topic — with the scalar clarity on each row.

    KL terms take exact integer count ratios through one 6dp rounding
    before the 5dp-rounded sum; the relevance set ranks by the rounded
    bm25 (doc_id tiebreak). Distributed shape: the linear bm25 scan,
    one top-10 TakeOrderedAndProject, Heaps-bounded corpus counts, all
    divergence work on 10 documents' vocabulary."""
    from .training import _BM25_TERMS, bm25_doc_scores  # noqa: F401 (terms doc'd)

    scores = bm25_doc_scores(spark, sf_dir)
    top_docs = scores.orderBy(F.desc("bm25"), "doc_id").limit(_CLARITY_TOPDOCS).select(
        "doc_id"
    )
    docs = table(spark, sf_dir, "documents")
    corpus = truncate_lineage(
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")),
        eager=False,
    )
    ccount = corpus.groupBy("tok").agg(F.count("*").cast("long").alias("ct"))
    ctot = ccount.agg(F.sum("ct").cast("long").alias("t"))
    rel = (
        corpus.join(F.broadcast(top_docs), "doc_id")
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("rc"))
    )
    rtot = rel.agg(F.sum("rc").cast("long").alias("rt"))
    p_top = (
        _CLARITY_LAMBDA * F.col("rc") / F.col("rt")
        + (1 - _CLARITY_LAMBDA) * F.col("ct") / F.col("t")
    )
    p_corpus = F.col("ct").cast("double") / F.col("t")
    contrib = truncate_lineage(
        rel.join(ccount, "tok")
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ctot))
        .select(
            "tok",
            "rc",
            "ct",
            F.round(p_top * F.log2(p_top / p_corpus), 6).alias("kl_term"),
        ),
        eager=False,
    )  # clarity scalar + the top-k both read it
    clarity = contrib.agg(F.round(F.sum("kl_term"), 5).alias("clarity"))
    from pyspark.sql import Window

    return (
        contrib.crossJoin(F.broadcast(clarity))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("kl_term"), "tok"))
            .cast("long"),
        )
        .filter(F.col("rank") <= _CLARITY_TOPK)
        .select(
            F.col("tok").alias("term"),
            F.col("rc").alias("rel_count"),
            F.col("ct").alias("corpus_count"),
            "kl_term",
            "clarity",
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# IPW ATE with stratified propensities (Horvitz-Thompson / Rosenbaum-Rubin)
# ---------------------------------------------------------------------------

_IPW_SPLIT_US = 1_705_363_200_000_000  # the CUPED mid-January split
_IPW_BUCKET_EVENTS = 10  # activity stratum width (pre-period event count)
_IPW_MAX_BUCKET = 4


def _ipw_oracle() -> str:
    return f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(count(CASE WHEN epoch_us(ts) < {_IPW_SPLIT_US} THEN 1 END)
                    AS BIGINT) AS n_pre,
               CAST(CASE WHEN count(CASE WHEN epoch_us(ts) < {_IPW_SPLIT_US}
                                   AND event_type = 'purchase' THEN 1 END)
                            > count(CASE WHEN epoch_us(ts) < {_IPW_SPLIT_US}
                                   AND event_type = 'click' THEN 1 END)
                         THEN 1 ELSE 0 END AS BIGINT) AS treated,
               CAST(sum(CASE WHEN epoch_us(ts) >= {_IPW_SPLIT_US}
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y_c
        FROM events GROUP BY 1
    ),
    strat AS (
        SELECT least({_IPW_MAX_BUCKET}, n_pre // {_IPW_BUCKET_EVENTS}) AS bucket,
               treated, y_c
        FROM per_user
    ),
    buckets AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(treated) AS BIGINT) AS n_treated,
               CAST(sum(treated * y_c) AS BIGINT) AS y_treated,
               CAST(sum((1 - treated) * y_c) AS BIGINT) AS y_control
        FROM strat GROUP BY 1
    ),
    valid AS (  -- positivity: both arms present in the stratum
        SELECT *, CAST(n - n_treated AS BIGINT) AS n_control
        FROM buckets WHERE n_treated > 0 AND n - n_treated > 0
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM valid),
    terms AS (  -- stratified IPW = per-bucket mean difference, n-weighted
        SELECT v.bucket, v.n, v.n_treated, v.n_control,
               round(CAST(v.n_treated AS DOUBLE) / v.n, 4) AS propensity,
               round((CAST(v.y_treated AS DOUBLE) / v.n_treated
                    - CAST(v.y_control AS DOUBLE) / v.n_control) / 100.0, 4)
                   AS bucket_effect,
               (CAST(v.y_treated AS DOUBLE) / v.n_treated
                - CAST(v.y_control AS DOUBLE) / v.n_control) * v.n / t.n_total
                   AS w_term
        FROM valid v CROSS JOIN tot t
    ),
    ate AS (SELECT round(sum(w_term) / 100.0, 4) AS ate FROM terms)
    SELECT bucket, n AS n_users, n_treated, n_control, propensity,
           bucket_effect, a.ate
    FROM terms CROSS JOIN ate a
    """


@register("ipw_ate_estimate", _ipw_oracle(), tags=("X-ipw",))
def ipw_ate_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified inverse-propensity ATE (Horvitz & Thompson 1952;
    Rosenbaum & Rubin 1983): treatment = a purchase-heavy pre-period
    (more pre purchases than pre clicks — self-selected, CONFOUNDED
    with activity), outcome = post-period spend, strata = pre-period
    activity buckets; within each stratum
    the treated/control mean difference is unconfounded-by-assumption
    and the ATE is the stratum-size-weighted average — algebraically
    identical to IPW with the stratified propensity estimate. The
    observational-causal member of the family: cuped_adjusted_ab
    adjusts a RANDOMIZED experiment's variance, this deconfounds a
    SELF-SELECTED exposure; strata violating positivity (single-arm)
    are excluded, and the per-bucket rows expose exactly where support
    is thin.

    Every mean is a ratio of exact cent/count integers; one rounded
    edge per published column. Distributed shape: one user-grain
    conditional aggregation, a bucket rollup (<= 5 rows), broadcast
    scalars — no data-grain joins or windows."""
    ev = table(spark, sf_dir, "events")
    us = ts_micros(ev)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.when(us < _IPW_SPLIT_US, 1)).cast("long").alias("n_pre"),
        (
            F.count(
                F.when((us < _IPW_SPLIT_US) & (F.col("event_type") == "purchase"), 1)
            )
            > F.count(
                F.when((us < _IPW_SPLIT_US) & (F.col("event_type") == "click"), 1)
            )
        )
        .cast("long")
        .alias("treated"),
        F.sum(F.when(us >= _IPW_SPLIT_US, cents).otherwise(0))
        .cast("long")
        .alias("y_c"),
    )
    strat = per_user.select(
        F.least(
            F.lit(_IPW_MAX_BUCKET),
            F.floor(F.col("n_pre") / _IPW_BUCKET_EVENTS).cast("long"),
        ).alias("bucket"),
        "treated",
        "y_c",
    )
    buckets = strat.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("treated").cast("long").alias("n_treated"),
        F.sum(F.col("treated") * F.col("y_c")).cast("long").alias("y_treated"),
        F.sum((1 - F.col("treated")) * F.col("y_c")).cast("long").alias("y_control"),
    )
    valid = truncate_lineage(
        buckets.filter(
            (F.col("n_treated") > 0) & (F.col("n") - F.col("n_treated") > 0)
        ).withColumn("n_control", (F.col("n") - F.col("n_treated")).cast("long")),
        eager=False,
    )  # total + terms both read it
    tot = valid.agg(F.sum("n").cast("long").alias("n_total"))
    diff = (
        F.col("y_treated").cast("double") / F.col("n_treated")
        - F.col("y_control").cast("double") / F.col("n_control")
    )
    terms = valid.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.col("n").alias("n_users"),
        "n_treated",
        "n_control",
        F.round(F.col("n_treated").cast("double") / F.col("n"), 4).alias("propensity"),
        F.round(diff / 100.0, 4).alias("bucket_effect"),
        (diff * F.col("n") / F.col("n_total")).alias("w_term"),
    )
    terms = truncate_lineage(terms, eager=False)
    ate = terms.agg(F.round(F.sum("w_term") / 100.0, 4).alias("ate"))
    return terms.crossJoin(F.broadcast(ate)).drop("w_term")


# ---------------------------------------------------------------------------
# Difference-in-differences on the hash-split arms
# ---------------------------------------------------------------------------


def _did_oracle() -> str:
    arm = portable_hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH cells AS (
        SELECT CASE WHEN {arm} % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
               CASE WHEN epoch_us(ts) < {_IPW_SPLIT_US} THEN 'pre' ELSE 'post' END
                   AS period,
               user_id, CAST(round(value * 100) AS BIGINT) AS v_c
        FROM events
    ),
    user_cells AS (
        SELECT arm, period, user_id, CAST(sum(v_c) AS BIGINT) AS y_c
        FROM cells GROUP BY 1, 2, 3
    ),
    panel AS (
        SELECT arm, period,
               CAST(count(*) AS BIGINT) AS n_users,
               round(CAST(sum(y_c) AS DOUBLE) / count(*) / 100.0, 4) AS mean_y
        FROM user_cells GROUP BY 1, 2
    ),
    did AS (
        SELECT round(
            (max(CASE WHEN arm = 'treatment' AND period = 'post' THEN mean_y END)
           - max(CASE WHEN arm = 'treatment' AND period = 'pre' THEN mean_y END))
          - (max(CASE WHEN arm = 'control' AND period = 'post' THEN mean_y END)
           - max(CASE WHEN arm = 'control' AND period = 'pre' THEN mean_y END)), 4)
            AS did_estimate
        FROM panel
    )
    SELECT p.arm, p.period, p.n_users, p.mean_y, d.did_estimate
    FROM panel p CROSS JOIN did d
    """


@register("did_panel_estimate", _did_oracle(), tags=("X-did",))
def did_panel_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (Card & Krueger 1994 design) on the
    hash-split arms across the mid-January boundary: the four
    (arm x period) per-user mean-spend cells plus DiD = (T_post -
    T_pre) - (C_post - C_pre), the estimator that differences away both
    the arms' level gap and the shared time trend — the panel-data
    causal member completing the trio: CUPED adjusts a randomized
    readout, IPW deconfounds a self-selected exposure, DiD handles a
    before/after rollout with a comparison group. On a truly randomized
    hash split DiD should be ~0 — the built-in A/A placebo check.

    Per-(arm, period, user) spends are exact cent integers; the four
    cell means are ratios of exact sums rounded at the edge, and DiD
    composes the ROUNDED means so the published identity holds
    bit-for-bit. Distributed shape: one user-cell aggregation, a 4-row
    panel rollup, one broadcast scalar."""
    ev = table(spark, sf_dir, "events")
    us = ts_micros(ev)
    cells = ev.select(
        F.when(portable_hash64(F.col("user_id").cast("string")) % 2 == 0, "control")
        .otherwise("treatment")
        .alias("arm"),
        F.when(us < _IPW_SPLIT_US, "pre").otherwise("post").alias("period"),
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("v_c"),
    )
    user_cells = cells.groupBy("arm", "period", "user_id").agg(
        F.sum("v_c").cast("long").alias("y_c")
    )
    panel = truncate_lineage(
        user_cells.groupBy("arm", "period").agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(
                F.sum("y_c").cast("double") / F.count("*") / 100.0, 4
            ).alias("mean_y"),
        ),
        eager=False,
    )  # the DiD scalar re-aggregates it
    pick = lambda a, p: F.max(  # noqa: E731
        F.when((F.col("arm") == a) & (F.col("period") == p), F.col("mean_y"))
    )
    did = panel.agg(
        F.round(
            (pick("treatment", "post") - pick("treatment", "pre"))
            - (pick("control", "post") - pick("control", "pre")),
            4,
        ).alias("did_estimate")
    )
    return panel.crossJoin(F.broadcast(did))


# ---------------------------------------------------------------------------
# Raking / iterative proportional fitting to uniform margins (Deming 1940)
# ---------------------------------------------------------------------------

_IPF_ROUNDS = 2


def _ipf_oracle() -> str:
    # two full IPF rounds (row scale, column scale) x2, micro-quantized
    steps = []
    prev = "w0"
    for r in range(_IPF_ROUNDS):
        steps.append(f"""
    rowtot_{r} AS (
        SELECT lang, sum(n * CAST({prev}_mu AS DOUBLE)) AS rt
        FROM {prev} GROUP BY 1
    ),
    rowscaled_{r} AS (  -- rt is micro-mass: scale target into micro-units
        SELECT c.lang, c.source, c.n,
               CAST(round(c.{prev}_mu * (t.lang_target * 1000000.0 / r.rt))
                    AS BIGINT) AS row_{r}_mu
        FROM {prev} c
        JOIN rowtot_{r} r USING (lang) CROSS JOIN targets t
    ),
    coltot_{r} AS (
        SELECT source, sum(n * CAST(row_{r}_mu AS DOUBLE)) AS ct
        FROM rowscaled_{r} GROUP BY 1
    ),
    w{r + 1} AS (
        SELECT c.lang, c.source, c.n,
               CAST(round(c.row_{r}_mu * (t.source_target * 1000000.0 / k.ct))
                    AS BIGINT) AS w{r + 1}_mu
        FROM rowscaled_{r} c
        JOIN coltot_{r} k USING (source) CROSS JOIN targets t
    )""")
        prev = f"w{r + 1}"
    chain = ",".join(steps)
    return f"""
    WITH cellc AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ),
    scalars AS (
        SELECT CAST(sum(n) AS BIGINT) AS total,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_lang,
               CAST(count(DISTINCT source) AS BIGINT) AS n_source
        FROM cellc
    ),
    targets AS (
        SELECT CAST(total AS DOUBLE) / n_lang AS lang_target,
               CAST(total AS DOUBLE) / n_source AS source_target
        FROM scalars
    ),
    w0 AS (SELECT lang, source, n, CAST(1000000 AS BIGINT) AS w0_mu FROM cellc),
    {chain},
    final_margin AS (
        SELECT lang, sum(n * CAST(w{_IPF_ROUNDS}_mu AS DOUBLE)) / 1000000.0
            AS lang_mass
        FROM w{_IPF_ROUNDS} GROUP BY 1
    )
    SELECT c.lang, c.source, c.n AS n_docs,
           round(c.w{_IPF_ROUNDS}_mu / 1000000.0, 6) AS raking_weight,
           round(m.lang_mass, 2) AS lang_margin_after
    FROM w{_IPF_ROUNDS} c JOIN final_margin m USING (lang)
    """


@register("raking_ipf_weights", _ipf_oracle(), tags=("X-raking",))
def raking_ipf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raking / iterative proportional fitting (Deming & Stephan 1940):
    two full IPF rounds scaling the lang x source cell weights to
    UNIFORM language and source margins — survey-calibration weighting,
    the WEIGHTING view of what temperature_source_mix achieves by
    sampling (keep every document, reweight instead of discard; the
    fitted weights are what a loss-reweighted training run would use).
    After round two the language margins are already near-uniform
    (lang_margin_after exposes the residual); source margins were
    matched exactly by the last column scaling.

    Weights are re-quantized to micro-unit INTEGERS after every scaling
    step (margin totals are then exact integer-weighted sums), so both
    engines iterate identical values — the IPF analog of the k-means
    rounded-argmin discipline. Distributed shape: one (lang, source)
    cell aggregation, then four margin-rollup/broadcast-join rounds on
    the |langs| x |sources| cell frame — metadata-scale forever."""
    docs = table(spark, sf_dir, "documents")
    cellc = truncate_lineage(
        docs.groupBy("lang", "source").agg(F.count("*").cast("long").alias("n")),
        eager=False,
    )
    scalars = cellc.agg(
        F.sum("n").cast("long").alias("total"),
        F.count_distinct("lang").cast("long").alias("n_lang"),
        F.count_distinct("source").cast("long").alias("n_source"),
    )
    targets = scalars.select(
        (F.col("total").cast("double") / F.col("n_lang")).alias("lang_target"),
        (F.col("total").cast("double") / F.col("n_source")).alias("source_target"),
    )
    w = cellc.crossJoin(F.broadcast(targets)).withColumn(
        "w_mu", F.lit(1000000).cast("long")
    )
    for _ in range(_IPF_ROUNDS):
        rowtot = w.groupBy("lang").agg(
            F.sum(F.col("n") * F.col("w_mu").cast("double")).alias("rt")
        )
        w = w.join(F.broadcast(rowtot), "lang").withColumn(
            "w_mu",
            # rt is micro-mass: scale the plain-unit target into micro-units
            F.round(
                F.col("w_mu") * (F.col("lang_target") * 1000000.0 / F.col("rt")), 0
            ).cast("long"),
        ).drop("rt")
        coltot = w.groupBy("source").agg(
            F.sum(F.col("n") * F.col("w_mu").cast("double")).alias("ct")
        )
        w = w.join(F.broadcast(coltot), "source").withColumn(
            "w_mu",
            F.round(
                F.col("w_mu") * (F.col("source_target") * 1000000.0 / F.col("ct")), 0
            ).cast("long"),
        ).drop("ct")
    w = truncate_lineage(w, eager=False)  # margin rollup re-reads it
    final_margin = w.groupBy("lang").agg(
        (F.sum(F.col("n") * F.col("w_mu").cast("double")) / 1000000.0).alias(
            "lang_mass"
        )
    )
    return w.join(final_margin, "lang").select(
        "lang",
        "source",
        F.col("n").alias("n_docs"),
        F.round(F.col("w_mu") / 1000000.0, 6).alias("raking_weight"),
        F.round(F.col("lang_mass"), 2).alias("lang_margin_after"),
    )
