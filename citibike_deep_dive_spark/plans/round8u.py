"""Round-8 continuation batch 19: count-process diagnostics, local
differential privacy, and embedding geometry — the index of dispersion
per event type (Fisher 1925's variance-to-mean ratio with its
chi-square test: is each event stream Poisson, bursty, or regular —
the assumption check in front of every rate model the catalog fits),
randomized-response prevalence estimation (Warner 1965 — the LOCAL
differential-privacy mechanism, debiased exactly; dp_noisy_histogram
adds noise centrally AFTER aggregation, Warner's coin protects each
row before it is ever collected), and the embedding anisotropy ratio
(Mu & Viswanath 2018's all-but-the-top diagnosis: how much of the
total variance the top principal component hoards — anisotropic
embeddings make cosine similarity saturate, which quietly degrades
every ANN/dedup query upstream).

Engine-exactness: dispersion moments are exact integer sums over
day x type cells; the randomized-response coin is the shared portable
md5 and the debias is a ratio of exact counts; anisotropy reuses
pca_power_iteration's published eigenvalue against an exact quantized
trace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from ..functions.portable import portable_hash64, portable_hash64_sql
from .catalog import register, table

# ---------------------------------------------------------------------------
# Index of dispersion per event type (Fisher 1925)
# ---------------------------------------------------------------------------


@register(
    "dispersion_index_by_type",
    """
    WITH cells AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(c) AS BIGINT) AS total,
               CAST(sum(c * c) AS BIGINT) AS ss
        FROM cells GROUP BY 1
    )
    SELECT event_type, n_days, total,
           round(CAST(total AS DOUBLE) / n_days, 4) AS mean_daily,
           round((CAST(ss AS DOUBLE) - CAST(total AS DOUBLE) * total / n_days)
                 / (n_days - 1), 4) AS var_daily,
           round(((CAST(ss AS DOUBLE) - CAST(total AS DOUBLE) * total / n_days)
                  / (n_days - 1)) / (CAST(total AS DOUBLE) / n_days), 4)
               AS dispersion_index,
           round((n_days - 1)
                 * ((CAST(ss AS DOUBLE) - CAST(total AS DOUBLE) * total / n_days)
                    / (n_days - 1)) / (CAST(total AS DOUBLE) / n_days), 4)
               AS chi2_stat
    FROM stats
    """,
    tags=("X-dispersion",),
)
def dispersion_index_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (Fisher 1925) of daily counts per event
    type: sample variance over mean, with the chi-square statistic
    (n-1) * D whose null (Poisson arrivals) distribution is
    chi-square(n-1) — D >> 1 is overdispersion (bursty arrivals:
    negative-binomial territory, and the EWMA/CUSUM monitors need wider
    control limits than the Poisson ones), D << 1 is under-dispersion
    (throttled/scheduled traffic). The distributional ASSUMPTION CHECK
    in front of every count model in the catalog — none of the
    time-series queries tests it.

    Moments are exact integer sums over (type, day) cells; three
    rounded ratios at the edge. Distributed shape: one two-key
    aggregation (map-side combined) then a type-grain rollup —
    calendar x types forever."""
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    stats = cells.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    mean = F.col("total").cast("double") / F.col("n_days")
    var = (
        F.col("ss").cast("double")
        - F.col("total").cast("double") * F.col("total") / F.col("n_days")
    ) / (F.col("n_days") - 1)
    return stats.select(
        "event_type",
        "n_days",
        "total",
        F.round(mean, 4).alias("mean_daily"),
        F.round(var, 4).alias("var_daily"),
        F.round(var / mean, 4).alias("dispersion_index"),
        F.round((F.col("n_days") - 1) * var / mean, 4).alias("chi2_stat"),
    )


# ---------------------------------------------------------------------------
# Randomized-response prevalence estimation (Warner 1965)
# ---------------------------------------------------------------------------

_RR_P_NUM = 3  # truth probability p = 3/4  (epsilon = ln(p/(1-p)) = ln 3)
_RR_P_DEN = 4


def _rr_oracle() -> str:
    coin1 = portable_hash64_sql("'rr:coin:' || CAST(doc_id AS VARCHAR)")
    coin2 = portable_hash64_sql("'rr:fake:' || CAST(doc_id AS VARCHAR)")
    return f"""
    WITH truth AS (  -- sensitive bit: is the document English?
        SELECT doc_id, source,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    reported AS (  -- report truth w.p. 3/4, else a fresh md5 coin
        SELECT doc_id, source, b,
               CASE WHEN {coin1} % {_RR_P_DEN} < {_RR_P_NUM}
                    THEN b ELSE CAST({coin2} % 2 AS INTEGER) END AS r
        FROM truth
    ),
    per_src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(r) AS BIGINT) AS n_reported,
               CAST(sum(b) AS BIGINT) AS n_true
        FROM reported GROUP BY 1
    )
    SELECT source, n, n_reported,
           round(CAST(n_reported AS DOUBLE) / n, 4) AS reported_rate,
           -- debias: E[r] = p*pi + (1-p)/2  =>  pi = (rate - (1-p)/2)/p
           round((CAST(n_reported AS DOUBLE) / n
                  - {(1 - _RR_P_NUM / _RR_P_DEN) / 2})
                 / {_RR_P_NUM / _RR_P_DEN}, 4) AS estimated_rate,
           round(CAST(n_true AS DOUBLE) / n, 4) AS true_rate
    FROM per_src
    """


@register("randomized_response_prevalence", _rr_oracle(), tags=("X-warner-rr",))
def randomized_response_prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner 1965 randomized response over the per-document "is
    English" bit: each row reports the truth with p = 3/4 and a fresh
    coin otherwise (local epsilon = ln 3), then the per-source
    prevalence is debiased exactly via pi = (rate - (1-p)/2) / p — the
    LOCAL differential-privacy member of the privacy family:
    k-anonymity/l-diversity/t-closeness audit a released table,
    dp_noisy_histogram privatizes a central aggregate, Warner's coin
    protects every row BEFORE collection (the collector never learns
    any individual bit). true_rate rides along as the built-in
    estimator-error audit — possible here only because this is a
    simulation of the mechanism.

    Both coins are the shared portable md5 (identical flips on both
    engines, replayable across retries); the debias is a closed-form
    ratio of exact counts. Distributed shape: one narrow projection,
    one source-grain rollup — no joins, no windows."""
    docs = table(spark, sf_dir, "documents")
    coin1 = portable_hash64(
        F.concat(F.lit("rr:coin:"), F.col("doc_id").cast("string"))
    )
    coin2 = portable_hash64(
        F.concat(F.lit("rr:fake:"), F.col("doc_id").cast("string"))
    )
    b = (F.col("lang") == "en").cast("int")
    reported = docs.select(
        "source",
        b.alias("b"),
        F.when(coin1 % _RR_P_DEN < _RR_P_NUM, b)
        .otherwise((coin2 % 2).cast("int"))
        .alias("r"),
    )
    per_src = reported.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r").cast("long").alias("n_reported"),
        F.sum("b").cast("long").alias("n_true"),
    )
    p = _RR_P_NUM / _RR_P_DEN
    rate = F.col("n_reported").cast("double") / F.col("n")
    return per_src.select(
        "source",
        "n",
        "n_reported",
        F.round(rate, 4).alias("reported_rate"),
        F.round((rate - (1 - p) / 2) / p, 4).alias("estimated_rate"),
        F.round(F.col("n_true").cast("double") / F.col("n"), 4).alias("true_rate"),
    )


# ---------------------------------------------------------------------------
# Embedding anisotropy ratio (Mu & Viswanath 2018)
# ---------------------------------------------------------------------------


def _aniso_oracle() -> str:
    from .catalog import CATALOG as _CAT
    from .round8b import _PCA_D, _PCA_Q

    pca_sql = _CAT["pca_power_iteration"].oracle
    return f"""
    WITH pca AS (SELECT * FROM ({pca_sql}) p),
    q AS (
        SELECT vec_id, g.i - 1 AS i,
               CAST(round(CAST(embedding[g.i] AS DOUBLE) * {_PCA_Q}, 0)
                    AS BIGINT) AS q
        FROM embeddings, generate_series(1, {_PCA_D}) g(i)
    ),
    dimvar AS (  -- exact per-dim scatter from the quantized sums
        SELECT i,
               (CAST(count(*) AS DOUBLE) * sum(CAST(q AS HUGEINT) * q)
                - CAST(sum(q) AS DOUBLE) * CAST(sum(q) AS DOUBLE))
               / (CAST(count(*) AS DOUBLE) * count(*)
                  * {float(_PCA_Q) ** 2}) AS v
        FROM q GROUP BY 1
    ),
    tr AS (SELECT sum(v) AS trace FROM dimvar),
    ev AS (SELECT max(eigenvalue) AS lambda1 FROM pca)
    SELECT CAST({_PCA_D} AS BIGINT) AS n_dims,
           round(ev.lambda1, 6) AS top_eigenvalue,
           round(tr.trace, 6) AS total_variance,
           round(tr.trace / {_PCA_D}, 6) AS mean_dim_variance,
           round(ev.lambda1 / (tr.trace / {_PCA_D}), 4) AS anisotropy_ratio,
           round(ev.lambda1 / tr.trace, 6) AS variance_explained
    FROM ev CROSS JOIN tr
    """


@register("embedding_anisotropy_ratio", _aniso_oracle(), tags=("X-anisotropy",))
def embedding_anisotropy_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding anisotropy (Mu & Viswanath 2018, "All-but-the-Top"):
    the top principal eigenvalue against the mean per-dimension
    variance and the total variance it explains, over the first 16
    dims — the GLOBAL geometry-health number behind the per-vector
    diagnostics (hubness counts symptomatic vectors,
    pca_outlier_scores flags them; anisotropy says whether the SPACE
    itself has collapsed onto a dominant direction, which saturates
    cosine similarity and silently degrades every ANN/near-dup query).
    Ratio ~ 1 = isotropic; >> 1 = remove-the-top-components territory.

    The trace comes from exact quantized integer scatter sums
    (identical centering to the PCA oracle) and the eigenvalue is
    pca_power_iteration's published Rayleigh estimate, so both engines
    divide identical numbers. Distributed shape: the PCA moment pass
    plus one per-dim variance aggregation — both d-bounded after one
    linear scan."""
    from .round8b import _PCA_D, _PCA_Q, pca_power_iteration

    emb = table(spark, sf_dir, "embeddings")
    comp = pca_power_iteration(spark, sf_dir)
    ev = comp.agg(F.max("eigenvalue").alias("lambda1"))
    qa = F.transform(
        F.slice("embedding", 1, _PCA_D),
        lambda x: F.round(x.cast("double") * _PCA_Q, 0).cast("long"),
    )
    dim = (
        emb.select(F.posexplode(qa).alias("i", "q"))
        .groupBy("i")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("q").cast("long").alias("sx"),
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sxx"),
        )
    )
    v = (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) / (
        F.col("n").cast("double") * F.col("n").cast("double")
        * float(_PCA_Q) ** 2
    )
    tr = dim.select(v.alias("v")).agg(F.sum("v").alias("trace"))
    return ev.crossJoin(F.broadcast(tr)).select(
        F.lit(_PCA_D).cast("long").alias("n_dims"),
        F.round(F.col("lambda1"), 6).alias("top_eigenvalue"),
        F.round(F.col("trace"), 6).alias("total_variance"),
        F.round(F.col("trace") / _PCA_D, 6).alias("mean_dim_variance"),
        F.round(F.col("lambda1") / (F.col("trace") / _PCA_D), 4).alias(
            "anisotropy_ratio"
        ),
        F.round(F.col("lambda1") / F.col("trace"), 6).alias("variance_explained"),
    )
