"""Round-8 continuation batch 6: held-out language-model evaluation,
forecast-quality decomposition, and windowed order statistics —
held-out Kneser-Ney perplexity per source (the ACTUAL CCNet
methodology: Wenzek et al. 2020 score documents with an LM trained on
held-IN data; ccnet_perplexity_buckets consumes such scores,
kneser_ney_bigram_probs builds in-sample parameters, this one closes
the loop with a hash-split train/eval protocol and OOV backoff),
Murphy's 1973 decomposition of the Brier score into reliability /
resolution / uncertainty (the component view behind calibration_ece_bins'
gap column), and an exact 7-day rolling MEDIAN of the daily volume
(rolling_7day_range_frame covers mean/min/max — built-in window
aggregates; the median needs the full window multiset, a genuinely
different shape).

Engine-exactness: per-bigram bit costs are micro-unit integers before
the per-source weighted sums; the raw Brier sum has the integer
numerator (s_m - pos*SCALE)^2 accumulated as decimal/HUGEINT; the
rolling median sorts a bounded (<= 7-element) integer list per day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from ..functions.portable import portable_hash64, portable_hash64_sql
from .catalog import register, table

# ---------------------------------------------------------------------------
# Held-out Kneser-Ney perplexity per source
# ---------------------------------------------------------------------------

_KNH_D = 0.75
_KNH_FOLDS = 5  # doc_id hash % 5 == 0 -> eval, else train


def _knh_oracle() -> str:
    h = portable_hash64_sql("'knsplit:' || CAST(doc_id AS VARCHAR)")
    return f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(lower(text), ' ') AS ws,
               ({h}) % {_KNH_FOLDS} = 0 AS is_eval
        FROM documents
        WHERE len(string_split(lower(text), ' ')) >= 2
    ),
    tbi AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT ws[i] AS w1, ws[i + 1] AS w2
              FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
                    FROM toks WHERE NOT is_eval))
        GROUP BY 1, 2
    ),
    fwd AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw1,
                   CAST(count(*) AS BIGINT) AS n_fwd FROM tbi GROUP BY 1),
    bwd AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_bwd FROM tbi GROUP BY 1),
    btot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM tbi),
    ebi AS (
        SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT source, ws[i] AS w1, ws[i + 1] AS w2
              FROM (SELECT source, ws, unnest(generate_series(1, len(ws) - 1)) AS i
                    FROM toks WHERE is_eval))
        GROUP BY 1, 2, 3
    ),
    scored AS (
        SELECT e.source, e.cnt,
               CASE WHEN t.c IS NULL THEN 1 ELSE 0 END AS unseen,
               CAST(round(-log2(
                   CASE WHEN f.cw1 IS NOT NULL THEN
                       (CASE WHEN t.c IS NOT NULL
                             THEN (t.c - {_KNH_D}) / f.cw1 ELSE 0.0 END)
                       + ({_KNH_D} * f.n_fwd / f.cw1)
                         * (CASE WHEN bw.n_bwd IS NOT NULL
                                 THEN CAST(bw.n_bwd AS DOUBLE) / bt.b
                                 ELSE 0.5 / bt.b END)
                   ELSE CASE WHEN bw.n_bwd IS NOT NULL
                             THEN CAST(bw.n_bwd AS DOUBLE) / bt.b
                             ELSE 0.5 / bt.b END
                   END) * 1000000) AS BIGINT) AS bits_mu
        FROM ebi e
        LEFT JOIN fwd f USING (w1)
        LEFT JOIN bwd bw USING (w2)
        LEFT JOIN tbi t ON e.w1 = t.w1 AND e.w2 = t.w2
        CROSS JOIN btot bt
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           round(CAST(sum(unseen * cnt) AS DOUBLE) / sum(cnt), 5)
               AS unseen_bigram_rate,
           round(CAST(sum(cnt * bits_mu) AS DOUBLE) / (sum(cnt) * 1000000.0), 5)
               AS mean_bits,
           round(exp(ln(2.0) * CAST(sum(cnt * bits_mu) AS DOUBLE)
                     / (sum(cnt) * 1000000.0)), 3) AS perplexity
    FROM scored GROUP BY 1
    """


@register("kneser_ney_heldout_perplexity", _knh_oracle(), tags=("X-kn-heldout",))
def kneser_ney_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out interpolated Kneser-Ney perplexity per source — the
    CCNet protocol (Wenzek et al. 2020) made honest: the bigram LM is
    trained on the hash-split train fold (doc hash % {_KNH_FOLDS} != 0)
    and every EVAL-fold bigram is scored against it, so a source full of
    templated text the model has seen scores low and genuinely novel
    text scores high — the number a perplexity-based quality gate should
    actually gate on, where in-sample cross-entropy (bigram_lm_cross_
    entropy) rewards self-similarity. OOV backoff: an unseen bigram
    under a seen context costs only the discount mass times the
    continuation probability; an unseen continuation gets the half-count
    floor 0.5/B; an unseen CONTEXT falls back to the pure continuation
    model — every case emitted, none clamped away, with the unseen rate
    reported alongside (unseen-rate and perplexity together diagnose
    whether a high score is novelty or noise).

    Per-bigram bit costs become micro-unit INTEGERS before any sum, so
    the per-source weighted mean is exact int64 arithmetic; eval
    bigrams aggregate to (source, w1, w2, count) grain first so the
    model joins run at bigram-vocabulary grain, never token grain.
    Distributed shape: one bigram explode per fold, three vocab-grain
    left joins, one per-source aggregation."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    toks = docs.filter(F.size(ws) >= 2).select(
        "source",
        ws.alias("ws"),
        (
            F.pmod(
                portable_hash64(F.concat(F.lit("knsplit:"), F.col("doc_id").cast("string"))),
                F.lit(_KNH_FOLDS),
            )
            == 0
        ).alias("is_eval"),
    )
    toks = truncate_lineage(toks, eager=False)

    def bigrams(df):
        return df.select(
            "source",
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("g"),
        ).select("source", "g.w1", "g.w2")

    tbi = (
        bigrams(toks.filter(~F.col("is_eval")))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tbi = truncate_lineage(tbi, eager=False)
    fwd = tbi.groupBy("w1").agg(
        F.sum("c").cast("long").alias("cw1"),
        F.count("*").cast("long").alias("n_fwd"),
    )
    bwd = tbi.groupBy("w2").agg(F.count("*").cast("long").alias("n_bwd"))
    btot = tbi.agg(F.count("*").cast("long").alias("b"))
    ebi = (
        bigrams(toks.filter(F.col("is_eval")))
        .groupBy("source", "w1", "w2")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    pcont = F.when(
        F.col("n_bwd").isNotNull(), F.col("n_bwd").cast("double") / F.col("b")
    ).otherwise(0.5 / F.col("b"))
    p = F.when(
        F.col("cw1").isNotNull(),
        F.when(
            F.col("c").isNotNull(), (F.col("c") - _KNH_D) / F.col("cw1")
        ).otherwise(0.0)
        + (_KNH_D * F.col("n_fwd") / F.col("cw1")) * pcont,
    ).otherwise(pcont)
    scored = (
        ebi.join(fwd, "w1", "left")
        .join(bwd, "w2", "left")
        .join(tbi, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(btot))
        .select(
            "source",
            "cnt",
            F.when(F.col("c").isNull(), 1).otherwise(0).alias("unseen"),
            F.round(-F.log2(p) * 1000000, 0).cast("long").alias("bits_mu"),
        )
    )
    mean_bits = F.sum(F.col("cnt") * F.col("bits_mu")).cast("double") / (
        F.sum("cnt") * 1000000.0
    )
    return scored.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        F.round(
            F.sum(F.col("unseen") * F.col("cnt")).cast("double") / F.sum("cnt"), 5
        ).alias("unseen_bigram_rate"),
        F.round(mean_bits, 5).alias("mean_bits"),
        F.round(F.exp(F.lit(float(__import__("math").log(2.0))) * mean_bits), 3).alias(
            "perplexity"
        ),
    )


# ---------------------------------------------------------------------------
# Murphy decomposition of the Brier score (Murphy 1973)
# ---------------------------------------------------------------------------

_BR_NCHARS = 160  # same label as calibration_ece_bins
_BR_SCALE = 1_000_000


@register(
    "brier_murphy_decomposition",
    f"""
    WITH m AS (
        SELECT CASE WHEN n_chars >= {_BR_NCHARS} THEN 1 ELSE 0 END AS pos,
               CAST(round(CAST(len(list_distinct(ws)) AS DOUBLE)
                          / CAST(len(ws) AS DOUBLE) * {_BR_SCALE}, 0) AS BIGINT) AS s_m
        FROM (SELECT n_chars, string_split(lower(text), ' ') AS ws FROM documents)
    ),
    binned AS (
        SELECT least(CAST(s_m * 10 // {_BR_SCALE} AS INT), 9) AS bin, pos, s_m FROM m
    ),
    per_bin AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n_k,
               CAST(sum(pos) AS BIGINT) AS p_k,
               CAST(sum(s_m) AS BIGINT) AS s_k
        FROM binned GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p,
               sum(CAST((s_m - pos * {_BR_SCALE}) AS HUGEINT)
                   * (s_m - pos * {_BR_SCALE})) AS raw_num
        FROM binned
    ),
    comps AS (
        SELECT
            sum(CAST((CAST(b.s_k AS DOUBLE) / (b.n_k * {_BR_SCALE}.0)
                      - CAST(b.p_k AS DOUBLE) / b.n_k) AS DOUBLE)
                * (CAST(b.s_k AS DOUBLE) / (b.n_k * {_BR_SCALE}.0)
                   - CAST(b.p_k AS DOUBLE) / b.n_k) * b.n_k) / t.n AS rel,
            sum((CAST(b.p_k AS DOUBLE) / b.n_k - CAST(t.p AS DOUBLE) / t.n)
                * (CAST(b.p_k AS DOUBLE) / b.n_k - CAST(t.p AS DOUBLE) / t.n)
                * b.n_k) / t.n AS res,
            (CAST(t.p AS DOUBLE) / t.n) * (1.0 - CAST(t.p AS DOUBLE) / t.n) AS unc,
            CAST(t.raw_num AS DOUBLE) / (CAST(t.n AS DOUBLE)
                                         * {_BR_SCALE}.0 * {_BR_SCALE}.0) AS brier_raw,
            t.n AS n, CAST(t.p AS DOUBLE) / t.n AS base_rate
        FROM per_bin b CROSS JOIN tot t
        GROUP BY t.n, t.p, t.raw_num
    )
    SELECT n AS n_docs, round(base_rate, 5) AS base_rate,
           round(brier_raw, 6) AS brier_raw,
           round(rel, 6) AS reliability,
           round(res, 6) AS resolution,
           round(unc, 6) AS uncertainty,
           round(rel - res + unc, 6) AS brier_binned,
           round(brier_raw - (rel - res + unc), 6) AS within_bin_variance
    FROM comps
    """,
    tags=("X-brier",),
)
def brier_murphy_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy's 1973 decomposition of the Brier score over the same
    (confidence = distinct-token ratio, label = length >= {_BR_NCHARS})
    setup as calibration_ece_bins: Brier = reliability - resolution +
    uncertainty, where reliability is the calibration error ECE
    measures (squared, n-weighted), resolution is how much the forecast
    SEPARATES outcomes (the part ECE cannot see — a useless constant
    forecast is perfectly calibrated), and uncertainty is the outcome's
    intrinsic variance. The within_bin_variance column is the exact gap
    between the raw-score Brier and its binned decomposition — the
    binning-loss audit.

    The raw Brier sum has the INTEGER numerator (s_m - pos*SCALE)^2
    accumulated as HUGEINT/decimal; the bin components are 10-term
    sums of integer-ratio doubles rounded at the edge. One scan, one
    bin aggregation, one scalar row."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    m = docs.select(
        F.when(F.col("n_chars") >= _BR_NCHARS, 1).otherwise(0).alias("pos"),
        F.round(
            F.size(F.array_distinct(ws)).cast("double") / F.size(ws) * _BR_SCALE, 0
        )
        .cast("long")
        .alias("s_m"),
    )
    binned = m.select(
        F.least((F.col("s_m") * 10 / _BR_SCALE).cast("int"), F.lit(9)).alias("bin"),
        "pos",
        "s_m",
    )
    binned = truncate_lineage(binned, eager=False)
    per_bin = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_k"),
        F.sum("pos").cast("long").alias("p_k"),
        F.sum("s_m").cast("long").alias("s_k"),
    )
    raw_dev = (F.col("s_m") - F.col("pos") * _BR_SCALE).cast("decimal(38,0)")
    tot = binned.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
        F.sum(raw_dev * (F.col("s_m") - F.col("pos") * _BR_SCALE)).alias("raw_num"),
    )
    f_k = F.col("s_k").cast("double") / (F.col("n_k") * float(_BR_SCALE))
    o_k = F.col("p_k").cast("double") / F.col("n_k")
    base = F.col("p").cast("double") / F.col("n")
    comps = (
        per_bin.crossJoin(F.broadcast(tot))
        .groupBy("n", "p", "raw_num")
        .agg(
            (F.sum((f_k - o_k) * (f_k - o_k) * F.col("n_k")) / F.first("n")).alias(
                "rel"
            ),
            (F.sum((o_k - base) * (o_k - base) * F.col("n_k")) / F.first("n")).alias(
                "res"
            ),
        )
    )
    return comps.select(
        F.col("n").alias("n_docs"),
        F.round(base, 5).alias("base_rate"),
        F.round(
            F.col("raw_num").cast("double")
            / (F.col("n").cast("double") * float(_BR_SCALE) * float(_BR_SCALE)),
            6,
        ).alias("brier_raw"),
        F.round("rel", 6).alias("reliability"),
        F.round("res", 6).alias("resolution"),
        F.round(base * (1.0 - base), 6).alias("uncertainty"),
        F.round(F.col("rel") - F.col("res") + base * (1.0 - base), 6).alias(
            "brier_binned"
        ),
        F.round(
            F.col("raw_num").cast("double")
            / (F.col("n").cast("double") * float(_BR_SCALE) * float(_BR_SCALE))
            - (F.col("rel") - F.col("res") + base * (1.0 - base)),
            6,
        ).alias("within_bin_variance"),
    )


# ---------------------------------------------------------------------------
# Exact rolling 7-day median of the daily volume
# ---------------------------------------------------------------------------

_RM_WINDOW = 7  # trailing days, current day inclusive


@register(
    "rolling_median_daily_volume",
    f"""
    WITH daily AS (
        SELECT ts::DATE AS day, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    win AS (
        SELECT a.day, a.c AS c_today, list_sort(list(b.c)) AS vals
        FROM daily a JOIN daily b
          ON b.day BETWEEN a.day - {_RM_WINDOW - 1} AND a.day
        GROUP BY 1, 2
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, c_today,
           CAST(len(vals) AS BIGINT) AS n_in_window,
           round((vals[(len(vals) + 1) // 2]
                  + vals[(len(vals) + 2) // 2]) / 2.0, 1) AS rolling_median
    FROM win
    """,
    tags=("X-rolling-median",),
)
def rolling_median_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing {_RM_WINDOW}-day MEDIAN of the daily event volume —
    the robust companion to rolling_7day_range_frame's mean/min/max:
    built-in window aggregates cannot produce an exact median (it needs
    the window's full multiset), so the window is materialized as a
    day-grid self-band-join and each day's <= {_RM_WINDOW} integer
    counts are sorted in place; the median is the average of the two
    middle order statistics (equal for odd windows). A one-sided spike
    moves the rolling mean for a week but leaves this median untouched
    — the on-call drift signal.

    The band join runs on the DAY GRID (series length x window width
    rows — calendar-bounded, corpus-size-free), and the per-day sort is
    over at most {_RM_WINDOW} int64 values: deterministic on both
    engines because the values themselves are the sort key. Ramp-in
    days report their honest shorter window via n_in_window."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    daily = truncate_lineage(daily, eager=False)
    a = daily.select(F.col("day").alias("aday"), F.col("c").alias("c_today"))
    b = daily.select(F.col("day").alias("bday"), F.col("c").alias("bc"))
    win = (
        a.join(
            F.broadcast(b),
            (F.col("bday") >= F.date_sub(F.col("aday"), _RM_WINDOW - 1))
            & (F.col("bday") <= F.col("aday")),
        )
        .groupBy("aday", "c_today")
        .agg(F.array_sort(F.collect_list("bc")).alias("vals"))
    )
    n = F.size("vals")
    return win.select(
        F.date_format("aday", "yyyy-MM-dd").alias("day"),
        "c_today",
        n.cast("long").alias("n_in_window"),
        F.round(
            (
                F.element_at("vals", ((n + 1) / 2).cast("int"))
                + F.element_at("vals", ((n + 2) / 2).cast("int"))
            )
            / 2.0,
            1,
        ).alias("rolling_median"),
    )
