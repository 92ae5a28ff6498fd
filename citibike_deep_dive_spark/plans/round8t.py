"""Round-8 continuation batch 18: motif discovery and forecast
evaluation — a matrix-profile sweep over the daily-revenue series (Yeh
et al. 2016's MP idea at calendar scale: for every sliding window, the
distance to its nearest NON-OVERLAPPING window — minima are motifs,
the repeated weekly shapes; the maximum is the discord, the one week
that matches nothing, which is anomaly detection WITHOUT a model), and
MASE forecast evaluation (Hyndman & Koehler 2006: MAE of naive /
seasonal-naive / drift forecasters scaled by the in-sample naive MAE —
the scale-free forecast scorecard that says whether revenue_change_
forecast's EWMA is even beating "tomorrow = today").

Engine-exactness: window distances are exact integer sums of squared
cent differences (the aligned-window trick needs no normalization);
MASE numerators/denominators are exact integer absolute-difference
sums with one rounded ratio each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table

# ---------------------------------------------------------------------------
# Matrix-profile motifs and discord over daily revenue (Yeh et al. 2016)
# ---------------------------------------------------------------------------

_MP_WIN = 7  # window length (one week)


def _mp_oracle() -> str:
    return f"""
    WITH daily AS (
        SELECT row_number() OVER (ORDER BY day) - 1 AS t, yc FROM (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
            FROM events GROUP BY 1
        )
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
    winpos AS (
        SELECT t AS p FROM daily CROSS JOIN nn WHERE t <= n - {_MP_WIN}
    ),
    pairs AS (  -- aligned squared distance between non-overlapping windows
        SELECT a.p AS pa, b.p AS pb,
               CAST(sum((da.yc - db.yc) * (da.yc - db.yc)) AS HUGEINT) AS d2
        FROM winpos a
        JOIN winpos b ON abs(a.p - b.p) >= {_MP_WIN}
        JOIN daily da ON da.t BETWEEN a.p AND a.p + {_MP_WIN} - 1
        JOIN daily db ON db.t = da.t - a.p + b.p
        GROUP BY 1, 2
    ),
    profile AS (
        SELECT pa AS pos, CAST(d2 AS DOUBLE) AS min_d2,
               CAST(pb AS BIGINT) AS nn_pos
        FROM (SELECT pa, pb, d2,
                     row_number() OVER (PARTITION BY pa
                                        ORDER BY d2, pb) AS rn
              FROM pairs)
        WHERE rn = 1
    ),
    stats AS (
        SELECT min(min_d2) AS motif_d2, max(min_d2) AS discord_d2 FROM profile
    )
    SELECT p.pos, p.nn_pos,
           round(sqrt(p.min_d2) / 100.0, 2) AS nn_dist,
           CAST(CASE WHEN p.min_d2 = s.motif_d2 THEN 1 ELSE 0 END AS INT)
               AS is_motif,
           CAST(CASE WHEN p.min_d2 = s.discord_d2 THEN 1 ELSE 0 END AS INT)
               AS is_discord
    FROM profile p CROSS JOIN stats s
    """


@register("matrix_profile_motifs", _mp_oracle(), tags=("X-matrix-profile",))
def matrix_profile_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix profile (Yeh et al. 2016) of daily revenue with window 7:
    per window position, the distance to the nearest NON-OVERLAPPING
    week (exclusion zone = the window length, so trivial self-matches
    never win) — the minimum pair is the MOTIF (the repeated weekly
    shape), the maximum is the DISCORD (the week that matches nothing:
    model-free anomaly detection, the complement to cusum/EWMA which
    need a baseline to deviate from). SAX symbolizes windows for
    indexing; the matrix profile gives the exact nearest-neighbor
    structure SAX approximates.

    Window distances are exact integer sums of squared cent
    differences on ALIGNED offsets (da.t - a.p = db.t - b.p), computed
    by one index-shifted join — no per-pair array materialization; the
    min_by nearest neighbor tie-breaks on position. Distributed shape:
    one day-grain aggregation, then an O(windows^2 x window) grid that
    is CALENDAR-bounded (24 positions here; ~13M terms for a decade of
    daily data — still nothing) — never corpus-bounded."""
    ev = table(spark, sf_dir, "events")
    daily = truncate_lineage(
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("yc")
        )
        .select(
            (F.row_number().over(Window.orderBy("day")) - 1).cast("long").alias("t"),
            "yc",
        ),
        eager=False,
    )  # window positions + both aligned join sides read it
    nn = daily.agg(F.count("*").cast("long").alias("n"))
    winpos = (
        daily.crossJoin(F.broadcast(nn))
        .filter(F.col("t") <= F.col("n") - _MP_WIN)
        .select(F.col("t").alias("p"))
    )
    a = winpos.select(F.col("p").alias("pa"))
    b = winpos.select(F.col("p").alias("pb"))
    da = daily.select(F.col("t").alias("ta"), F.col("yc").alias("ya"))
    db = daily.select(F.col("t").alias("tb"), F.col("yc").alias("yb"))
    pairs = (
        a.join(b, F.abs(F.col("pa") - F.col("pb")) >= _MP_WIN)
        .join(
            F.broadcast(da),
            (F.col("ta") >= F.col("pa")) & (F.col("ta") <= F.col("pa") + _MP_WIN - 1),
        )
        .join(F.broadcast(db), F.col("tb") == F.col("ta") - F.col("pa") + F.col("pb"))
        .groupBy("pa", "pb")
        .agg(
            F.sum(
                (F.col("ya") - F.col("yb")).cast("decimal(38,0)")
                * (F.col("ya") - F.col("yb"))
            )
            .cast("decimal(38,0)")
            .alias("d2")
        )
    )
    profile = pairs.groupBy(F.col("pa").alias("pos")).agg(
        F.min(F.col("d2").cast("double")).alias("min_d2"),
        F.min(F.struct(F.col("d2"), F.col("pb")))
        .getField("pb")
        .cast("long")
        .alias("nn_pos"),
    )
    profile = truncate_lineage(profile, eager=False)  # stats re-aggregate it
    stats = profile.agg(
        F.min("min_d2").alias("motif_d2"), F.max("min_d2").alias("discord_d2")
    )
    return profile.crossJoin(F.broadcast(stats)).select(
        "pos",
        "nn_pos",
        F.round(F.sqrt(F.col("min_d2")) / 100.0, 2).alias("nn_dist"),
        (F.col("min_d2") == F.col("motif_d2")).cast("int").alias("is_motif"),
        (F.col("min_d2") == F.col("discord_d2")).cast("int").alias("is_discord"),
    )


# ---------------------------------------------------------------------------
# MASE forecast evaluation (Hyndman & Koehler 2006)
# ---------------------------------------------------------------------------

_MASE_SEASON = 7


def _mase_oracle() -> str:
    return f"""
    WITH daily AS (
        SELECT row_number() OVER (ORDER BY day) - 1 AS t, yc FROM (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
            FROM events GROUP BY 1
        )
    ),
    joined AS (
        SELECT d.t, d.yc,
               l1.yc AS lag1, l7.yc AS lag7, d0.yc AS y0
        FROM daily d
        LEFT JOIN daily l1 ON l1.t = d.t - 1
        LEFT JOIN daily l7 ON l7.t = d.t - {_MASE_SEASON}
        CROSS JOIN (SELECT yc FROM daily WHERE t = 0) d0
    ),
    scale AS (  -- in-sample one-step naive MAE (the MASE denominator)
        SELECT CAST(sum(abs(yc - lag1)) AS BIGINT) AS sae,
               CAST(count(lag1) AS BIGINT) AS n1
        FROM joined
    ),
    models AS (
        SELECT 'naive_lag1' AS model,
               CAST(sum(abs(yc - lag1)) AS BIGINT) AS sae,
               CAST(count(lag1) AS BIGINT) AS n
        FROM joined WHERE lag1 IS NOT NULL
        UNION ALL
        SELECT 'seasonal_naive_lag7',
               CAST(sum(abs(yc - lag7)) AS BIGINT),
               CAST(count(lag7) AS BIGINT)
        FROM joined WHERE lag7 IS NOT NULL
        UNION ALL
        SELECT 'drift',
               CAST(sum(abs(yc - (y0 + CAST(round(CAST((yl.ylast - y0) AS DOUBLE)
                         * t / yl.tlast) AS BIGINT)))) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM joined
        CROSS JOIN (SELECT max(t) AS tlast,
                           max_by(yc, t) AS ylast FROM daily) yl
        WHERE t > 0
    )
    SELECT m.model, m.n AS n_evals,
           round(CAST(m.sae AS DOUBLE) / m.n / 100.0, 2) AS mae,
           round((CAST(m.sae AS DOUBLE) / m.n)
                 / (CAST(s.sae AS DOUBLE) / s.n1), 4) AS mase
    FROM models m CROSS JOIN scale s
    """


@register("forecast_mase_eval", _mase_oracle(), tags=("X-mase",))
def forecast_mase_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE forecast scorecard (Hyndman & Koehler 2006) for three
    baseline forecasters of daily revenue — naive (tomorrow = today),
    seasonal naive (next Monday = last Monday), and drift (the line
    from first to last observation): MAE scaled by the in-sample
    one-step naive MAE, so MASE < 1 means "beats carrying yesterday
    forward" — the scale-free evaluation the forecasting family lacked
    (ewma/revenue_change_forecast PRODUCE forecasts; nothing graded
    them). Seasonal-naive below 1 with naive at exactly 1 is the
    standard signature of weekly structure, which stl/seasonal_baseline
    decompose.

    All errors are exact integer |cent| sums (the drift forecast
    rounds to integer cents per step, deterministically on both
    engines); MAE and MASE are two rounded ratios. Distributed shape:
    one day-grain aggregation, three self-equi-joins on shifted day
    indices (calendar-bounded), scalar rollups."""
    ev = table(spark, sf_dir, "events")
    daily = truncate_lineage(
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("yc")
        )
        .select(
            (F.row_number().over(Window.orderBy("day")) - 1).cast("long").alias("t"),
            "yc",
        ),
        eager=False,
    )  # lag joins, anchors, and the scale all read it
    l1 = daily.select((F.col("t") + 1).alias("t"), F.col("yc").alias("lag1"))
    l7 = daily.select(
        (F.col("t") + _MASE_SEASON).alias("t"), F.col("yc").alias("lag7")
    )
    y0 = daily.filter(F.col("t") == 0).select(F.col("yc").alias("y0"))
    yl = daily.agg(
        F.max("t").cast("long").alias("tlast"),
        F.max(F.struct("t", "yc")).getField("yc").cast("long").alias("ylast"),
    )
    joined = truncate_lineage(
        daily.join(l1, "t", "left")
        .join(l7, "t", "left")
        .crossJoin(F.broadcast(y0))
        .crossJoin(F.broadcast(yl)),
        eager=False,
    )  # the scale and all three model rows read it
    scale = joined.agg(
        F.sum(F.abs(F.col("yc") - F.col("lag1"))).cast("long").alias("s_sae"),
        F.count("lag1").cast("long").alias("s_n"),
    )
    drift_pred = F.col("y0") + F.round(
        (F.col("ylast") - F.col("y0")).cast("double") * F.col("t") / F.col("tlast"),
        0,
    ).cast("long")
    rows = [
        joined.filter(F.col("lag1").isNotNull()).agg(
            F.lit("naive_lag1").alias("model"),
            F.sum(F.abs(F.col("yc") - F.col("lag1"))).cast("long").alias("sae"),
            F.count("*").cast("long").alias("n"),
        ),
        joined.filter(F.col("lag7").isNotNull()).agg(
            F.lit("seasonal_naive_lag7").alias("model"),
            F.sum(F.abs(F.col("yc") - F.col("lag7"))).cast("long").alias("sae"),
            F.count("*").cast("long").alias("n"),
        ),
        joined.filter(F.col("t") > 0).agg(
            F.lit("drift").alias("model"),
            F.sum(F.abs(F.col("yc") - drift_pred)).cast("long").alias("sae"),
            F.count("*").cast("long").alias("n"),
        ),
    ]
    models = rows[0]
    for r in rows[1:]:
        models = models.unionByName(r)
    return models.crossJoin(F.broadcast(scale)).select(
        "model",
        F.col("n").alias("n_evals"),
        F.round(F.col("sae").cast("double") / F.col("n") / 100.0, 2).alias("mae"),
        F.round(
            (F.col("sae").cast("double") / F.col("n"))
            / (F.col("s_sae").cast("double") / F.col("s_n")),
            4,
        ).alias("mase"),
    )
