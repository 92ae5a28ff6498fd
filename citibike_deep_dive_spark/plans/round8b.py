"""Round-8 extension: statistical-rigor queries for corpus curation —
the measurement half of a training-data pipeline. Quality filters and
mixture weights are only trustworthy with calibration curves, agreement
statistics, confidence intervals, association measures, and
diminishing-returns curves behind them; this module adds the five
canonical ones: reliability-diagram ECE bins (Naeini et al. 2015),
the Poisson bootstrap (Chamandy et al. 2012 — the one-pass bootstrap
for map-reduce), Cohen's kappa (Cohen 1960), lang x source mutual
information, and an n-gram coverage curve over quality deciles (the
data-scaling diminishing-returns diagnostic of Kaplan et al. 2020 /
Muennighoff et al. 2023).

Every query follows the catalog determinism rules (catalog.py module
docstring). Four of the five reduce ENTIRELY to integer aggregates with
exact final divisions (the bootstrap CI additionally replaces quantile
interpolation with order statistics at integer ranks, so no
interpolation formula has to agree across engines); only the mutual
information query sums transcendental terms, rounded at the edge per
the bigram_lm_cross_entropy precedent.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, table

# ---------------------------------------------------------------------------
# Reliability-diagram calibration bins (ECE components)
# ---------------------------------------------------------------------------

_CAL_NCHARS = 160  # "high quality" label: above-typical length
_CAL_SCALE = 1_000_000  # fixed-point scale for exact confidence sums


@register(
    "calibration_ece_bins",
    f"""
    WITH m AS (
        SELECT CASE WHEN n_chars >= {_CAL_NCHARS} THEN 1 ELSE 0 END AS pos,
               CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS s
        FROM (SELECT n_chars, string_split(lower(text), ' ') AS ws FROM documents)
    ),
    b AS (
        SELECT least(CAST(floor(s * 10) AS INT), 9) AS bin, pos,
               CAST(round(s * {_CAL_SCALE}, 0) AS BIGINT) AS s_m
        FROM m
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(pos) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pos_rate,
           CAST(sum(s_m) AS DOUBLE)
               / CAST(count(*) * {_CAL_SCALE} AS DOUBLE) AS mean_conf,
           CAST(sum(s_m) AS DOUBLE) / CAST(count(*) * {_CAL_SCALE} AS DOUBLE)
               - CAST(sum(pos) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS calib_gap
    FROM b GROUP BY 1
    """,
    tags=("X-calibration",),
)
def calibration_ece_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins (Naeini et al. 2015) for a cheap quality
    confidence score (distinct-token ratio) against a binary quality
    label (length gate): per bin, observed positive rate vs mean claimed
    confidence, whose gap is the per-bin ECE component. This is the
    standard audit before a learned quality classifier's scores are used
    as sampling weights. All aggregates are integers — confidences are
    fixed-point at 1e-6 before summing (an exact-double product/round
    both engines compute identically) — so every output is an exact
    integer ratio; no float accumulation crosses an engine boundary.

    Distributed shape: one scan computing label + score in the
    projection, one 10-group hash aggregation (map-side combined).
    Nothing else — the whole diagram is one shuffle of 10 rows at any
    corpus size."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    m = docs.select(
        F.when(F.col("n_chars") >= _CAL_NCHARS, 1).otherwise(0).alias("pos"),
        (
            F.size(F.array_distinct(ws)).cast("double") / F.size(ws).cast("double")
        ).alias("s"),
    )
    b = m.select(
        F.least(F.floor(F.col("s") * 10).cast("int"), F.lit(9)).alias("bin"),
        "pos",
        F.round(F.col("s") * _CAL_SCALE, 0).cast("long").alias("s_m"),
    )
    agg = b.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("s_m").cast("long").alias("sum_sm"),
    )
    pos_rate = F.col("n_pos").cast("double") / F.col("n_docs").cast("double")
    mean_conf = F.col("sum_sm").cast("double") / (
        F.col("n_docs") * _CAL_SCALE
    ).cast("double")
    return agg.select(
        "bin",
        "n_docs",
        "n_pos",
        pos_rate.alias("pos_rate"),
        mean_conf.alias("mean_conf"),
        (mean_conf - pos_rate).alias("calib_gap"),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval (Chamandy et al. 2012)
# ---------------------------------------------------------------------------

_BOOT_B = 100  # replicates
# Poisson(1) CDF thresholds scaled to 2^32: weight = #{k: T_k <= u}, cap 7.
_BOOT_T = [1580030168, 3160060337, 3950075421, 4213413783, 4279248373,
           4292415291, 4294609777]
_BOOT_LO = 3  # ceil(0.025 * B) order statistic
_BOOT_HI = 98  # ceil(0.975 * B)

_W_SQL = " + ".join(f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in _BOOT_T)


@register(
    "bootstrap_ci_mean",
    f"""
    WITH x AS (
        SELECT d.doc_id, d.n_chars, b.b,
               ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                                   || CAST(b.b AS VARCHAR)), 1, 8))::BIGINT AS u
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) b
    ),
    w AS (SELECT b, n_chars, {_W_SQL} AS w FROM x),
    reps AS (
        SELECT b, CAST(sum(w * n_chars) AS BIGINT) AS sw,
               CAST(sum(w) AS BIGINT) AS ww
        FROM w GROUP BY 1
    ),
    means AS (
        SELECT CAST(sw AS DOUBLE) / CAST(ww AS DOUBLE) AS m,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(sw AS DOUBLE) / CAST(ww AS DOUBLE), b) AS rn
        FROM reps
    ),
    pt AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sx
        FROM documents
    )
    SELECT pt.n_docs,
           CAST(pt.sx AS DOUBLE) / CAST(pt.n_docs AS DOUBLE) AS point_mean,
           lo.m AS ci_lo, hi.m AS ci_hi,
           CAST({_BOOT_B} AS INT) AS n_boot
    FROM pt
    CROSS JOIN (SELECT m FROM means WHERE rn = {_BOOT_LO}) lo
    CROSS JOIN (SELECT m FROM means WHERE rn = {_BOOT_HI}) hi
    """,
    tags=("X-bootstrap",),
)
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for mean document length via the Poisson
    bootstrap (Chamandy et al. 2012, "Estimating uncertainty for
    massive data streams" — Google's map-reduce bootstrap): instead of
    resampling rows (a shuffle per replicate), every row independently
    contributes Poisson(1) copies to each replicate, so ALL replicates
    accumulate in ONE pass with map-side combine. Weights come from an
    md5-derived uniform through an integer-threshold inverse CDF
    (portable-hash family), replicate means are exact int64 ratios, and
    the CI endpoints are ORDER STATISTICS at integer ranks (3rd/98th of
    100) — no quantile interpolation formula has to agree across
    engines. Tie-broken by replicate id.

    Distributed shape: ONE scan exploded x100 (narrow — no shuffle),
    one 100-group hash aggregation that also carries the point
    estimate's moments (every replicate group sees every doc, so
    count(*)/sum(n_chars) per group ARE the corpus totals — no second
    docs pass), a 100-row rank window, and a conditional-aggregation
    pick of the two order statistics (winning-pattern 10: one
    aggregation, not two filter+join branches re-running the parent).
    At 100 TB this is THE bootstrap that works: row-resampling is a
    full shuffle per replicate; this is one map-combined pass total."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    x = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).withColumn(
        "u",
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':',"
            " CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        ),
    )
    w = x.select("b", "n_chars", F.expr(_W_SQL).alias("w"))
    reps = w.groupBy("b").agg(
        F.sum(F.col("w") * F.col("n_chars")).cast("long").alias("sw"),
        F.sum("w").cast("long").alias("ww"),
        F.count("*").cast("long").alias("nd"),
        F.sum("n_chars").cast("long").alias("sx"),
    )
    m = (F.col("sw").cast("double") / F.col("ww").cast("double")).alias("m")
    means = reps.select(m, "b", "nd", "sx").withColumn(
        "rn", F.row_number().over(Window.orderBy("m", "b"))
    )
    return means.agg(
        F.min("nd").alias("n_docs"),
        (F.min("sx").cast("double") / F.min("nd").cast("double")).alias("point_mean"),
        F.min(F.when(F.col("rn") == _BOOT_LO, F.col("m"))).alias("ci_lo"),
        F.min(F.when(F.col("rn") == _BOOT_HI, F.col("m"))).alias("ci_hi"),
    ).withColumn("n_boot", F.lit(_BOOT_B).cast("int"))


# ---------------------------------------------------------------------------
# Cohen's kappa between two quality heuristics
# ---------------------------------------------------------------------------

_KAPPA_NCHARS = 160
_KAPPA_NTOKS = 30


@register(
    "cohens_kappa_agreement",
    f"""
    WITH c AS (
        SELECT CASE WHEN n_chars >= {_KAPPA_NCHARS} THEN 1 ELSE 0 END AS a,
               CASE WHEN len(string_split(lower(text), ' ')) >= {_KAPPA_NTOKS}
                    THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    k AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a * b) AS BIGINT) AS n11,
               CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
               CAST(sum((1 - a) * b) AS BIGINT) AS n01,
               CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
        FROM c
    )
    SELECT n AS n_docs, n11, n10, n01, n00,
           CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS p_observed,
           CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
               / CAST(n * n AS DOUBLE) AS p_expected,
           (CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
            - CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
                  / CAST(n * n AS DOUBLE))
           / (1 - CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
                       AS DOUBLE) / CAST(n * n AS DOUBLE)) AS kappa
    FROM k
    """,
    tags=("X-kappa",),
)
def cohens_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (Cohen 1960) between two document quality
    heuristics (length gate vs token-count gate) — chance-corrected
    agreement, the standard check that two labeling functions (or a
    cheap heuristic vs an expensive classifier) agree beyond what their
    marginal rates force. The whole statistic reduces to a 2x2 integer
    confusion matrix in ONE aggregation; po, pe and kappa are exact
    ratios of int64 products (n^2 fits int64 to ~3e9 docs per
    evaluation slice — shard by stratum beyond, the counts merge
    additively), so the output is engine-exact with no rounding.

    Distributed shape: one scan, one scalar hash aggregation with
    map-side combine. No shuffle of data-grain rows at any scale."""
    docs = table(spark, sf_dir, "documents")
    c = docs.select(
        F.when(F.col("n_chars") >= _KAPPA_NCHARS, 1).otherwise(0).alias("a"),
        F.when(
            F.size(F.split(F.lower("text"), " ")) >= _KAPPA_NTOKS, 1
        ).otherwise(0).alias("b"),
    )
    k = c.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
    )
    po = (F.col("n11") + F.col("n00")).cast("double") / F.col("n").cast("double")
    pe_num = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    pe = pe_num.cast("double") / (F.col("n") * F.col("n")).cast("double")
    return k.select(
        F.col("n").alias("n_docs"),
        "n11",
        "n10",
        "n01",
        "n00",
        po.alias("p_observed"),
        pe.alias("p_expected"),
        ((po - pe) / (1 - pe)).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Mutual information between language and source
# ---------------------------------------------------------------------------


@register(
    "lang_source_mutual_info",
    """
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    lm AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl FROM cells GROUP BY 1),
    sm AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs FROM cells GROUP BY 1),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
    SELECT n.n AS n_docs,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(sum((CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE))
                     * ln(CAST(c * n.n AS DOUBLE) / CAST(cl * cs AS DOUBLE))),
                 5) AS mi_nats
    FROM cells
    JOIN lm USING (lang) JOIN sm USING (source) CROSS JOIN n
    GROUP BY n.n
    """,
    tags=("X-mutual-info",),
)
def lang_source_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(lang; source) in nats — the association
    strength between two corpus strata. Near zero, language mix is
    homogeneous across sources and per-source language filters are
    redundant; high MI means a source carries a skewed language mix and
    mixture weights must be set per (lang, source) cell, not per
    source. Complements chi2_lang_source (significance) with effect
    size. Every ln argument is an exact int64 ratio (c*N / cl*cs); the
    final sum crosses ~|langs| x |sources| cells and is rounded at the
    edge per the bigram_lm_cross_entropy precedent.

    Distributed shape: ONE hash aggregation to cell grain (map-side
    combined — the only data-grain pass) collected straight into a
    single array row; margins, total, and the MI fold are higher-order
    functions over that array, which is FIXED-size
    (|langs| x |sources|, ~dozens of cells at any corpus scale) — the
    O(cells^2) margin lookups are constant work, and no window, join,
    or second exchange ever runs. Two stages total at any data size."""
    docs = table(spark, sf_dir, "documents")
    cells = (
        docs.groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("c"))
        .agg(
            F.collect_list(
                F.struct(F.col("lang"), F.col("source"), F.col("c"))
            ).alias("arr")
        )
    )
    return cells.select(
        F.expr("aggregate(arr, 0L, (a, x) -> a + x.c)").alias("n_docs"),
        F.size("arr").cast("long").alias("n_cells"),
        F.round(
            F.expr(
                """
                aggregate(
                  transform(arr, x ->
                    (CAST(x.c AS DOUBLE) / CAST(aggregate(arr, 0L,
                         (a, y) -> a + y.c) AS DOUBLE))
                    * ln(CAST(x.c * aggregate(arr, 0L, (a, y) -> a + y.c)
                              AS DOUBLE)
                         / CAST(aggregate(filter(arr, y -> y.lang = x.lang),
                                          0L, (a, y) -> a + y.c)
                                * aggregate(filter(arr, y -> y.source = x.source),
                                            0L, (a, y) -> a + y.c) AS DOUBLE))),
                  CAST(0 AS DOUBLE), (a, t) -> a + t)
                """
            ),
            5,
        ).alias("mi_nats"),
    )


# ---------------------------------------------------------------------------
# N-gram coverage curve over quality deciles (diminishing returns)
# ---------------------------------------------------------------------------


@register(
    "coverage_curve_by_quality",
    """
    WITH ranked AS (
        SELECT doc_id, text,
               CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
                    AS BIGINT) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM documents
    ),
    docs AS (
        SELECT doc_id,
               CAST(floor(CAST((rn - 1) * 10 AS DOUBLE) / CAST(n AS DOUBLE))
                    AS INT) + 1 AS decile,
               string_split(lower(text), ' ') AS ws
        FROM ranked
    ),
    grams AS (
        SELECT DISTINCT decile, ws[i] || ' ' || ws[i + 1] AS gram
        FROM (SELECT decile, ws, unnest(generate_series(1, len(ws) - 1)) AS i
              FROM docs WHERE len(ws) >= 2)
    ),
    firsts AS (
        SELECT gram, CAST(min(decile) AS INT) AS first_decile FROM grams GROUP BY 1
    ),
    per AS (
        SELECT first_decile AS decile, CAST(count(*) AS BIGINT) AS new_grams
        FROM firsts GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM firsts)
    SELECT decile, new_grams,
           CAST(sum(new_grams) OVER (ORDER BY decile) AS BIGINT) AS cum_grams,
           CAST(sum(new_grams) OVER (ORDER BY decile) AS DOUBLE)
               / CAST(total AS DOUBLE) AS coverage
    FROM per CROSS JOIN tot
    """,
    tags=("X-coverage-curve",),
)
def coverage_curve_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram coverage curve over quality deciles: rank documents by a
    quality proxy (length, tie doc_id), split into 10 deciles, and for
    each decile count the distinct word-bigrams seen for the FIRST time
    there. The cumulative curve is the diminishing-returns diagnostic
    behind data-selection budgets (Kaplan et al. 2020 scaling curves;
    Muennighoff et al. 2023 repeated-data value decay): a curve that
    flattens early says the low-quality tail adds little novel text.
    "First seen" is an integer min per gram — no per-decile distinct
    union is ever re-counted — and coverage is an exact integer ratio.

    Distributed shape: decile assignment is one global rank (the
    spearman precedent: at 100 TB it becomes a range-partition /
    approx-percentile bucket with identical downstream algebra) over a
    NARROW (doc_id, n_chars) projection — the text column never rides
    the rank sort's single ordered pass; the per-doc decile frame joins
    back onto the text scan on doc_id (data-grain, so NOT forced
    broadcast — AQE picks broadcast at small scale, sort-merge at
    100 TB). Exploded grams go STRAIGHT into the gram-grain min
    aggregation — no (decile, gram) pre-distinct, since duplicates
    cannot change a min and the dedupe would be a second data-grain
    shuffle; the final cumulative sum is a 10-row window. One
    data-grain shuffle total (the gram min)."""
    docs = table(spark, sf_dir, "documents")
    keys = docs.select("doc_id", "n_chars")
    ranked = keys.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("n_chars"), "doc_id"))
        .cast("long")
        .alias("rn"),
    ).crossJoin(F.broadcast(keys.agg(F.count("*").cast("long").alias("n"))))
    decile = (
        F.floor(((F.col("rn") - 1) * 10).cast("double") / F.col("n").cast("double"))
        .cast("int")
        + 1
    ).alias("decile")
    deciles = ranked.select("doc_id", decile)
    ws = F.split(F.lower("text"), " ")
    toks = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .join(deciles, "doc_id")
        .select("decile", "ws")
    )
    # winning-pattern 9: bigrams as zip_with over two shifted slices —
    # no per-gram array allocation.
    # No (decile, gram) DISTINCT before the min — duplicates cannot
    # change a min, so the dedupe shuffle is pure waste; the single
    # gram-grain aggregation absorbs them map-side.
    grams = toks.select(
        "decile",
        F.explode(
            F.zip_with(
                F.slice(F.col("ws"), 1, F.size("ws") - 1),
                F.slice(F.col("ws"), 2, F.size("ws") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("gram"),
    )
    firsts = grams.groupBy("gram").agg(F.min("decile").cast("int").alias("decile"))
    per = firsts.groupBy("decile").agg(F.count("*").cast("long").alias("new_grams"))
    tot = per.agg(F.sum("new_grams").cast("long").alias("total"))
    cum = F.sum("new_grams").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "decile",
        "new_grams",
        cum.cast("long").alias("cum_grams"),
        (cum.cast("double") / F.col("total").cast("double")).alias("coverage"),
    )
