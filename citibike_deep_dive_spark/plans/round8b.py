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
    # Explode grams STRAIGHT off the scan (full scan parallelism), then
    # join the NARROW per-doc decile frame onto the gram stream: joining
    # deciles into the text frame BEFORE the explode made the planner
    # broadcast the text side and run the whole explode on the rank
    # window's single output partition (sf1 A/B: 2.2 s single-core tail).
    # winning-pattern 9: bigrams as zip_with over two shifted slices —
    # no per-gram array allocation.
    # No (decile, gram) DISTINCT before the min — duplicates cannot
    # change a min, so the dedupe shuffle is pure waste; the single
    # gram-grain aggregation absorbs them map-side.
    grams = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("gram"),
        )
        .join(deciles.hint("shuffle_hash"), "doc_id")
        # shuffle-hash hint: Catalyst's size estimate through Generate
        # undercounts the exploded gram side and broadcasts IT (1.5M
        # rows at sf1) while probing from the rank window's single
        # partition; hashing both sides on doc_id is parallel at every
        # scale and never broadcasts data-grain frames.
    )
    firsts = grams.groupBy("gram").agg(F.min("decile").cast("int").alias("decile"))
    per = firsts.groupBy("decile").agg(F.count("*").cast("long").alias("new_grams"))
    # the grand total is a FULL-RANGE window over the same 10-row frame,
    # NOT a separate per.agg() + crossJoin — that second consumer
    # re-ran the entire gram pipeline (sf1: 4.4 -> ~0.5 s warm;
    # multiply-consumed-frame rule)
    cum = F.sum("new_grams").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    )
    total = F.sum("new_grams").over(
        Window.orderBy("decile").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return per.select(
        "decile",
        "new_grams",
        cum.cast("long").alias("cum_grams"),
        (cum.cast("double") / total.cast("double")).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# PCA top component by power iteration (decimal-exact, markov precedent)
# ---------------------------------------------------------------------------

_PCA_D = 16
_PCA_ITERS = 5
_PCA_Q = 1_000_000  # fixed-point quantization of embedding dims

_PCA_STEPS = ",\n".join(
    f"""
    y{t} AS (
        SELECT c.i AS i,
               CAST(sum(CAST(c.cd * x.v AS DECIMAL(30, 18))) AS DOUBLE) AS y
        FROM cmat c JOIN x{t - 1} x ON c.j = x.i
        GROUP BY 1
    ),
    n{t} AS (
        SELECT sqrt(CAST(sum(CAST(y * y AS DECIMAL(30, 18))) AS DOUBLE)) AS nrm
        FROM y{t}
    ),
    x{t} AS (SELECT i, y / nrm AS v FROM y{t}, n{t})"""
    for t in range(1, _PCA_ITERS + 1)
)


@register(
    "pca_power_iteration",
    f"""
    WITH q AS (
        SELECT vec_id, g.i - 1 AS i,
               CAST(round(CAST(embedding[g.i] AS DOUBLE) * {_PCA_Q}, 0)
                    AS BIGINT) AS q
        FROM embeddings, generate_series(1, {_PCA_D}) g(i)
    ),
    s AS (
        SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS s
        FROM q a JOIN q b USING (vec_id)
        GROUP BY 1, 2
    ),
    sx AS (SELECT i, CAST(sum(q) AS BIGINT) AS sx FROM q GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
    cmat AS (
        SELECT s.i, s.j,
               (CAST(nn.n * s.s AS DOUBLE) - CAST(a.sx * b.sx AS DOUBLE))
               / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
                  * {float(_PCA_Q) ** 2}) AS cd
        FROM s JOIN sx a ON s.i = a.i JOIN sx b ON s.j = b.i CROSS JOIN nn
    ),
    x0 AS (SELECT i, 1.0 / sqrt({float(_PCA_D)}) AS v FROM sx),
    {_PCA_STEPS}
    SELECT CAST(x.i AS INT) AS dim, round(x.v, 6) AS loading,
           round(n.nrm, 6) AS eigenvalue
    FROM x{_PCA_ITERS} x, n{_PCA_ITERS} n
    """,
    tags=("X-pca",),
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the first 16 embedding dims by 5
    power-iteration steps — the distributed PCA that embedding-space
    curation (SemDeDup cells, whitening, spectral outliers) builds on.
    The ONLY data-grain pass is the quantized second-moment
    accumulation: dims are fixed-point int64 (round(x*1e6), the
    mining.py distance idiom), so the Gram matrix and the column sums
    are EXACT integer sums over any partitioning; the centered scatter
    n*S - sx*sxT stays in int64 to ~200k vectors per slice (shard and
    add moments beyond — they merge exactly). The iteration is the
    markov_stationary_power pattern: products in double, sums in
    DECIMAL(30,18), L2 norm per step, 5 unrolled relational stages over
    the d^2-row (=256) matrix frame; the final step's norm IS the
    Rayleigh eigenvalue estimate (covariance is PSD). Start vector is
    uniform 1/sqrt(d), so the sign convention is deterministic.

    Distributed shape: one flat-map to (vec, i, q) grain and one
    d^2-bounded moment aggregation (map-side combined); everything
    after is fixed 256-row frames — iteration cost does not grow with
    the corpus at all. Spark-side the moment pass emits (i, j, qi*qj)
    structs from ONE projection (no self-join of the exploded frame,
    no double scan), with sx and n riding the same aggregation as
    sentinel rows j=-1 / j=-2."""
    from ..functions.lineage import truncate_lineage

    emb = table(spark, sf_dir, "embeddings")
    qa = F.transform(
        F.slice("embedding", 1, _PCA_D),
        lambda x: F.round(x.cast("double") * _PCA_Q, 0).cast("long"),
    )
    # per-row triples: 256 products + 16 sx sentinels (j=-1) + 1 n
    # sentinel (i=0, j=-2), all through one explode + one aggregation
    trips = emb.select(
        F.explode(
            F.concat(
                F.flatten(
                    F.transform(
                        qa,
                        lambda qi, i: F.transform(
                            qa,
                            lambda qj, j: F.struct(
                                i.alias("i"), j.alias("j"), (qi * qj).alias("p")
                            ),
                        ),
                    )
                ),
                F.transform(
                    qa,
                    lambda qi, i: F.struct(
                        i.alias("i"), F.lit(-1).alias("j"), qi.alias("p")
                    ),
                ),
                F.array(
                    F.struct(
                        F.lit(0).alias("i"),
                        F.lit(-2).alias("j"),
                        F.lit(1).cast("long").alias("p"),
                    )
                ),
            )
        ).alias("t")
    )
    moments = truncate_lineage(
        trips.groupBy(F.col("t.i").alias("i"), F.col("t.j").alias("j")).agg(
            F.sum("t.p").cast("long").alias("s")
        ),
        eager=False,
    )
    sx = moments.filter(F.col("j") == -1).select("i", F.col("s").alias("sx"))
    nn = moments.filter(F.col("j") == -2).select(F.col("s").alias("n"))
    cmat = (
        moments.filter(F.col("j") >= 0)
        .join(F.broadcast(sx.select(F.col("i").alias("ii"), F.col("sx").alias("sxi"))),
              F.col("i") == F.col("ii"))
        .join(F.broadcast(sx.select(F.col("i").alias("jj"), F.col("sx").alias("sxj"))),
              F.col("j") == F.col("jj"))
        .crossJoin(F.broadcast(nn))
        .select(
            "i",
            "j",
            (
                ((F.col("n") * F.col("s")).cast("double")
                 - (F.col("sxi") * F.col("sxj")).cast("double"))
                / (F.col("n").cast("double") * F.col("n").cast("double")
                   * F.lit(float(_PCA_Q) ** 2))
            ).alias("cd"),
        )
    )
    cmat = truncate_lineage(cmat, eager=False)
    x = sx.select("i", F.lit(1.0 / math.sqrt(_PCA_D)).alias("v"))
    nrm_frame = None
    for _ in range(_PCA_ITERS):
        y = truncate_lineage(
            cmat.join(x.select(F.col("i").alias("j"), "v"), "j")
            .groupBy("i")
            .agg(
                F.sum((F.col("cd") * F.col("v")).cast("decimal(30,18)"))
                .cast("double")
                .alias("y")
            ),
            eager=False,
        )
        nrm_frame = y.agg(
            F.sqrt(
                F.sum((F.col("y") * F.col("y")).cast("decimal(30,18)")).cast("double")
            ).alias("nrm")
        )
        x = y.crossJoin(F.broadcast(nrm_frame)).select(
            "i", (F.col("y") / F.col("nrm")).alias("v")
        )
    return x.crossJoin(F.broadcast(nrm_frame)).select(
        F.col("i").cast("int").alias("dim"),
        F.round("v", 6).alias("loading"),
        F.round("nrm", 6).alias("eigenvalue"),
    )


# ---------------------------------------------------------------------------
# Leave-one-source-out data valuation
# ---------------------------------------------------------------------------


@register(
    "loo_source_value",
    """
    WITH toks AS (
        SELECT source, string_split(lower(text), ' ') AS ws FROM documents
    ),
    base AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(ws)) AS BIGINT) AS n_tokens
        FROM toks GROUP BY 1
    ),
    grams AS (
        SELECT DISTINCT source, ws[i] || ' ' || ws[i + 1] AS gram
        FROM (SELECT source, ws, unnest(generate_series(1, len(ws) - 1)) AS i
              FROM toks WHERE len(ws) >= 2)
    ),
    gs AS (
        SELECT gram, CAST(count(*) AS BIGINT) AS nsrc, min(source) AS only_src
        FROM grams GROUP BY 1
    ),
    uniq AS (
        SELECT only_src AS source, CAST(count(*) AS BIGINT) AS unique_bigrams
        FROM gs WHERE nsrc = 1 GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total_bigrams FROM gs)
    SELECT b.source, b.n_docs, b.n_tokens,
           coalesce(u.unique_bigrams, 0) AS unique_bigrams,
           CAST(coalesce(u.unique_bigrams, 0) AS DOUBLE)
               / CAST(tot.total_bigrams AS DOUBLE) AS unique_share
    FROM base b LEFT JOIN uniq u USING (source) CROSS JOIN tot
    """,
    tags=("X-data-valuation",),
)
def loo_source_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out marginal value: for each source, the count
    and corpus share of word-bigrams that exist ONLY in that source —
    the coverage a pipeline loses by dropping it. This is the
    first-order (singleton) term of data Shapley valuation, the
    standard cheap screen before paying for full ablation runs; sources
    whose unique share is ~0 are redundant with the rest of the mix.
    Integer-exact: per-gram source counts and the min-source tiebreak
    are one aggregation, and shares are exact int64 ratios.

    Distributed shape: one (source, gram) dedupe shuffle (map-side
    combined), one gram-grain count+min aggregation, then source-grain
    frames of |sources| rows. The 'appears in exactly one source' test
    never materializes per-source gram sets — count + min in one pass
    identifies the owner without a second join against the gram
    frame."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    toks = docs.select("source", ws.alias("ws"))
    base = toks.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size("ws")).cast("long").alias("n_tokens"),
    )
    grams = (
        toks.filter(F.size("ws") >= 2)
        .select(
            "source",
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("gram"),
        )
        .distinct()
    )
    gs = grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("nsrc"), F.min("source").alias("only_src")
    )
    # owner-or-null grouping folds "unique per source" and "total grams"
    # into ONE pass over the gram frame (multiply-consumed-frame rule:
    # a separate scalar count would re-run the whole gram pipeline);
    # the |sources|+1-row result is lazily checkpointed because uniq
    # and tot both read it.
    from ..functions.lineage import truncate_lineage

    g2 = truncate_lineage(
        gs.groupBy(
            F.when(F.col("nsrc") == 1, F.col("only_src")).alias("source")
        ).agg(F.count("*").cast("long").alias("cnt")),
        eager=False,
    )
    uniq = g2.filter(F.col("source").isNotNull()).select(
        "source", F.col("cnt").alias("unique_bigrams")
    )
    tot = g2.agg(F.sum("cnt").cast("long").alias("total_bigrams"))
    return (
        base.join(uniq, "source", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.coalesce(F.col("unique_bigrams"), F.lit(0))
            .cast("long")
            .alias("unique_bigrams"),
            (
                F.coalesce(F.col("unique_bigrams"), F.lit(0)).cast("double")
                / F.col("total_bigrams").cast("double")
            ).alias("unique_share"),
        )
    )


# ---------------------------------------------------------------------------
# Isotonic calibration over score bins (PAV via the minimax identity)
# ---------------------------------------------------------------------------


@register(
    "isotonic_calibration_bins",
    f"""
    WITH m AS (
        SELECT CASE WHEN n_chars >= {_CAL_NCHARS} THEN 1 ELSE 0 END AS pos,
               CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS s
        FROM (SELECT n_chars, string_split(lower(text), ' ') AS ws FROM documents)
    ),
    b AS (
        SELECT least(CAST(floor(s * 10) AS INT), 9) AS bin,
               CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
        FROM m GROUP BY 1
    ),
    cum AS (
        SELECT bin, n, p,
               CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
               CAST(sum(p) OVER (ORDER BY bin) AS BIGINT) AS cp
        FROM b
    ),
    lo AS (
        SELECT bin AS j, coalesce(lag(cn) OVER (ORDER BY bin), 0) AS cn0,
               coalesce(lag(cp) OVER (ORDER BY bin), 0) AS cp0
        FROM cum
    ),
    mm AS (
        SELECT lo.j, cum.bin AS k,
               CAST(cum.cp - lo.cp0 AS DOUBLE)
                   / CAST(cum.cn - lo.cn0 AS DOUBLE) AS mjk
        FROM lo JOIN cum ON cum.bin >= lo.j
    ),
    inner_min AS (
        SELECT c.bin AS i, mm.j, min(mm.mjk) AS inner_m
        FROM cum c JOIN mm ON mm.j <= c.bin AND mm.k >= c.bin
        GROUP BY 1, 2
    ),
    iso AS (SELECT i AS bin, max(inner_m) AS iso_rate FROM inner_min GROUP BY 1)
    SELECT cum.bin, cum.n AS n_docs, cum.p AS n_pos,
           CAST(cum.p AS DOUBLE) / CAST(cum.n AS DOUBLE) AS raw_rate,
           iso.iso_rate AS iso_rate
    FROM cum JOIN iso ON cum.bin = iso.bin
    """,
    tags=("X-isotonic",),
)
def isotonic_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone nondecreasing) calibration of the binned
    quality score via the minimax identity — the closed form of
    pool-adjacent-violators (Ayer et al. 1955; Zadrozny & Elkan 2002
    for classifier calibration): iso(i) = max_{{j<=i}} min_{{k>=i}}
    mean(pos rate over bins j..k). Where the raw reliability diagram
    (calibration_ece_bins) is non-monotone, isotonic pooling is the
    standard repair before scores become sampling weights. Every pooled
    mean is an exact int64 prefix-difference ratio, and min/max of
    exact doubles is engine-deterministic — no iteration, no rounding
    anywhere.

    Distributed shape: the data-grain work is the SAME single 10-group
    aggregation as calibration_ece_bins; the minimax runs over
    O(bins^3)=220 combinations of a 10-row frame (three bounded window
    /join stages) — constant work at any corpus size. The classic
    sequential PAV loop would be a driver-side scan; the minimax form
    is order-free and fully relational."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    m = docs.select(
        F.when(F.col("n_chars") >= _CAL_NCHARS, 1).otherwise(0).alias("pos"),
        (
            F.size(F.array_distinct(ws)).cast("double") / F.size(ws).cast("double")
        ).alias("s"),
    )
    from ..functions.lineage import truncate_lineage

    b = m.groupBy(
        F.least(F.floor(F.col("s") * 10).cast("int"), F.lit(9)).alias("bin")
    ).agg(F.count("*").cast("long").alias("n"), F.sum("pos").cast("long").alias("p"))
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = truncate_lineage(
        b.select(
            "bin",
            "n",
            "p",
            F.sum("n").over(wcum).cast("long").alias("cn"),
            F.sum("p").over(wcum).cast("long").alias("cp"),
        ),
        eager=False,
    )  # 10 rows, consumed by lo / mm / inner_min / final join
    wlag = Window.orderBy("bin")
    lo = cum.select(
        F.col("bin").alias("j"),
        F.coalesce(F.lag("cn").over(wlag), F.lit(0).cast("long")).alias("cn0"),
        F.coalesce(F.lag("cp").over(wlag), F.lit(0).cast("long")).alias("cp0"),
    )
    mm = lo.join(cum, cum.bin >= lo.j).select(
        "j",
        F.col("bin").alias("k"),
        (
            (F.col("cp") - F.col("cp0")).cast("double")
            / (F.col("cn") - F.col("cn0")).cast("double")
        ).alias("mjk"),
    )
    inner = (
        cum.select(F.col("bin").alias("i"))
        .join(mm, (mm.j <= F.col("i")) & (mm.k >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("mjk").alias("inner_m"))
    )
    iso = inner.groupBy(F.col("i").alias("bin")).agg(
        F.max("inner_m").alias("iso_rate")
    )
    return cum.join(iso, "bin").select(
        "bin",
        F.col("n").alias("n_docs"),
        F.col("p").alias("n_pos"),
        (F.col("p").cast("double") / F.col("n").cast("double")).alias("raw_rate"),
        "iso_rate",
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimator on the token frequency distribution
# ---------------------------------------------------------------------------

_HILL_K = 50


@register(
    "hill_tail_index",
    f"""
    WITH counts AS (
        SELECT gram, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT ws[i] || ' ' || ws[i + 1] AS gram
              FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
                    FROM (SELECT string_split(lower(text), ' ') AS ws
                          FROM documents)
                    WHERE len(ws) >= 2))
        GROUP BY 1
    ),
    ranked AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, gram) AS rn FROM counts
    ),
    thr AS (SELECT c AS c_k1 FROM ranked WHERE rn = {_HILL_K + 1})
    SELECT CAST({_HILL_K} AS INT) AS k,
           thr.c_k1 AS threshold_count,
           round(sum(ln(CAST(r.c AS DOUBLE) / CAST(thr.c_k1 AS DOUBLE)))
                 / {_HILL_K}, 5) AS hill_inv_alpha,
           round({_HILL_K} / sum(ln(CAST(r.c AS DOUBLE)
                                    / CAST(thr.c_k1 AS DOUBLE))), 5) AS alpha
    FROM ranked r CROSS JOIN thr
    WHERE r.rn <= {_HILL_K}
    GROUP BY thr.c_k1
    """,
    tags=("X-tail-index",),
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator (Hill 1975) of the power-law tail index over the
    word-bigram frequency distribution (the unigram vocabulary of the
    synthetic corpus is only 31 types — below k+1 — so the estimator
    runs at the bigram grain, where Zipf structure is real):
    alpha^-1 = mean over the top-k frequencies of ln(x_(i) / x_(k+1)). The maximum-likelihood
    complement to vocab_zipf_fit's regression slope — tail indexes
    drive vocabulary sizing and BPE merge budgets (how much mass the
    long tail holds decides how many merges pay off). Every ln argument
    is an exact int64 count ratio; the k-term sum is rounded at the
    edge (bigram_lm precedent). Ranking ties break by token, and only
    COUNT VALUES enter the estimate, so tie order cannot change it.

    Distributed shape: one token-grain count aggregation (map-side
    combined), a TakeOrdered top-(k+1) — never a full sort of the
    vocabulary — and a k-row scalar aggregation with the threshold
    count broadcast."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    counts = (
        docs.select(ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("c"))
    )
    from ..functions.lineage import truncate_lineage

    ranked = truncate_lineage(
        counts.select(
            "c", F.row_number().over(Window.orderBy(F.desc("c"), "gram")).alias("rn")
        ).filter(F.col("rn") <= _HILL_K + 1),
        eager=False,
    )  # 51 rows; consumed by the top-k sum and the threshold row
    thr = ranked.filter(F.col("rn") == _HILL_K + 1).select(
        F.col("c").alias("c_k1")
    )
    lnsum = F.sum(
        F.log(F.col("c").cast("double") / F.col("c_k1").cast("double"))
    )
    return (
        ranked.filter(F.col("rn") <= _HILL_K)
        .crossJoin(F.broadcast(thr))
        .groupBy("c_k1")
        .agg(
            F.round(lnsum / _HILL_K, 5).alias("hill_inv_alpha"),
            F.round(F.lit(_HILL_K) / lnsum, 5).alias("alpha"),
        )
        .select(
            F.lit(_HILL_K).cast("int").alias("k"),
            F.col("c_k1").alias("threshold_count"),
            "hill_inv_alpha",
            "alpha",
        )
    )


# ---------------------------------------------------------------------------
# Pairwise 1-D Wasserstein distance between source length distributions
# ---------------------------------------------------------------------------


@register(
    "wasserstein_source_lengths",
    """
    WITH counts AS (
        SELECT source, n_chars AS x, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    support AS (SELECT DISTINCT x FROM counts),
    srcs AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1
    ),
    grid AS (
        SELECT s.source, s.n, sup.x, coalesce(c.c, 0) AS c
        FROM srcs s CROSS JOIN support sup
        LEFT JOIN counts c ON c.source = s.source AND c.x = sup.x
    ),
    cdf AS (
        SELECT source, n, x,
               CAST(sum(c) OVER (PARTITION BY source ORDER BY x) AS BIGINT)
                   AS cum,
               lead(x) OVER (PARTITION BY source ORDER BY x) AS x_next
        FROM grid
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(sum(abs(a.cum * b.n - b.cum * a.n)
                    * (a.x_next - a.x)) AS DOUBLE)
               / CAST(a.n * b.n AS DOUBLE) AS w1_chars
    FROM cdf a
    JOIN cdf b ON a.x = b.x AND a.source < b.source
    WHERE a.x_next IS NOT NULL
    GROUP BY 1, 2, a.n, b.n
    """,
    tags=("X-wasserstein",),
)
def wasserstein_source_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth mover's) distance between every
    pair of per-source document-length distributions: W1 = integral of
    |CDF_a - CDF_b|, evaluated on the merged support grid. The
    distribution-shift complement to ks_drift_statistic (KS is the max
    CDF gap — W1 is its integral, the quantity mixture rebalancing
    actually moves). INTEGER-EXACT throughout: the integrand is
    |cum_a*n_b - cum_b*n_a| * dx in int64 (cross-multiplied CDFs never
    form a float), and the single final division by n_a*n_b is the only
    double — no transcendentals, no rounding.

    Distributed shape: one (source, length) count aggregation
    (map-side combined — the only data-grain pass), then a
    |sources| x |support| grid (~10^3 rows at ANY corpus size: support
    is value-distinct, Heaps-bounded) with per-source cumulative
    windows and a self-join on the grid point. At 100 TB the grid is
    unchanged — corpus size only raises the counts."""
    docs = table(spark, sf_dir, "documents")
    from ..functions.lineage import truncate_lineage

    counts = truncate_lineage(
        docs.groupBy("source", F.col("n_chars").alias("x")).agg(
            F.count("*").cast("long").alias("c")
        ),
        eager=False,
    )  # consumed by support, srcs, and the grid join
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
            F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cum"),
            F.lead("x").over(w).alias("x_next"),
        ),
        eager=False,
    )  # both sides of the pair self-join read it
    a = cdf.alias("a")
    b = cdf.alias("b")
    term = F.abs(
        F.col("a.cum") * F.col("b.n") - F.col("b.cum") * F.col("a.n")
    ) * (F.col("a.x_next") - F.col("a.x"))
    return (
        a.join(
            b,
            (F.col("a.x") == F.col("b.x")) & (F.col("a.source") < F.col("b.source")),
        )
        .filter(F.col("a.x_next").isNotNull())
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.sum(term).cast("double").alias("num"))
        .select(
            "source_a",
            "source_b",
            (F.col("num") / (F.col("na") * F.col("nb")).cast("double")).alias(
                "w1_chars"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Sequence-packing efficiency curve across context lengths
# ---------------------------------------------------------------------------

_PACK_CTXS = (64, 256, 1024)


@register(
    "packing_efficiency_curve",
    f"""
    WITH t AS (
        SELECT CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tok
        FROM documents
    ),
    ctx AS (SELECT unnest(ARRAY{list(_PACK_CTXS)}) AS ctx)
    SELECT CAST(ctx AS INT) AS ctx,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS total_tokens,
           CAST(sum(((tok + ctx - 1) // ctx) * ctx) AS BIGINT) AS padded_tokens,
           CAST(sum(tok) AS DOUBLE)
               / CAST(sum(((tok + ctx - 1) // ctx) * ctx) AS DOUBLE)
               AS pad_efficiency,
           CAST(sum(tok) AS DOUBLE)
               / CAST(((sum(tok) + ctx - 1) // ctx) * ctx AS DOUBLE)
               AS concat_efficiency
    FROM t CROSS JOIN ctx
    GROUP BY ctx
    """,
    tags=("X-packing-curve",),
)
def packing_efficiency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing efficiency at three context lengths under the two
    canonical batching models: per-document padding (each doc rounded
    up to whole ctx blocks — the no-packing baseline) vs ideal stream
    concatenation (one global ceil — the upper bound any packer chases;
    token_packing implements the greedy middle ground at one ctx). The
    efficiency GAP between the two columns is the packer's headroom,
    and how it closes as ctx shrinks drives the context-length choice
    for heterogeneous corpora. Integer-exact: ceil-division in int64,
    two exact final ratios per row.

    Distributed shape: one scan exploded x3 contexts straight into a
    3-group aggregation (map-side combined). One tiny shuffle at any
    corpus size."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("tok")
    )
    ctxs = F.explode(
        F.array(*[F.lit(c).cast("long") for c in _PACK_CTXS])
    ).alias("ctx")
    x = t.select("tok", ctxs)
    blocks = F.floor((F.col("tok") + F.col("ctx") - 1) / F.col("ctx"))
    agg = x.groupBy("ctx").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("total_tokens"),
        F.sum(blocks * F.col("ctx")).cast("long").alias("padded_tokens"),
    )
    concat_blocks = F.floor(
        (F.col("total_tokens") + F.col("ctx") - 1) / F.col("ctx")
    )
    return agg.select(
        F.col("ctx").cast("int").alias("ctx"),
        "n_docs",
        "total_tokens",
        "padded_tokens",
        (
            F.col("total_tokens").cast("double")
            / F.col("padded_tokens").cast("double")
        ).alias("pad_efficiency"),
        (
            F.col("total_tokens").cast("double")
            / (concat_blocks * F.col("ctx")).cast("double")
        ).alias("concat_efficiency"),
    )


# ---------------------------------------------------------------------------
# Fleiss' kappa across three quality heuristics
# ---------------------------------------------------------------------------

_FLEISS_RATERS = 3
_FLEISS_RATIO = 0.55  # distinct-token-ratio gate for rater 3


@register(
    "fleiss_kappa_three_raters",
    f"""
    WITH r AS (
        SELECT (CASE WHEN n_chars >= {_KAPPA_NCHARS} THEN 1 ELSE 0 END
              + CASE WHEN len(ws) >= {_KAPPA_NTOKS} THEN 1 ELSE 0 END
              + CASE WHEN CAST(len(list_distinct(ws)) AS DOUBLE)
                          / CAST(len(ws) AS DOUBLE) >= {_FLEISS_RATIO}
                     THEN 1 ELSE 0 END) AS pos
        FROM (SELECT n_chars, string_split(lower(text), ' ') AS ws
              FROM documents)
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS tot_pos,
               CAST(sum(pos * pos) AS BIGINT) AS s2
        FROM r
    )
    SELECT n AS n_docs,
           CAST({_FLEISS_RATERS} AS INT) AS n_raters,
           -- P_bar: mean per-item agreement = (s2 + (m^2 - m) - (2m-2)*tot_pos
           -- over items) / (n*m*(m-1)); derived from pos and m-pos pair counts
           CAST(2 * s2 - 2 * {_FLEISS_RATERS} * tot_pos
                + n * {_FLEISS_RATERS * (_FLEISS_RATERS - 1)} AS DOUBLE)
               / CAST(n * {_FLEISS_RATERS * (_FLEISS_RATERS - 1)} AS DOUBLE)
               AS p_bar,
           CAST(tot_pos * tot_pos
                + (n * {_FLEISS_RATERS} - tot_pos)
                  * (n * {_FLEISS_RATERS} - tot_pos) AS DOUBLE)
               / CAST(n * n * {_FLEISS_RATERS * _FLEISS_RATERS} AS DOUBLE)
               AS p_e,
           (CAST(2 * s2 - 2 * {_FLEISS_RATERS} * tot_pos
                 + n * {_FLEISS_RATERS * (_FLEISS_RATERS - 1)} AS DOUBLE)
                / CAST(n * {_FLEISS_RATERS * (_FLEISS_RATERS - 1)} AS DOUBLE)
            - CAST(tot_pos * tot_pos
                   + (n * {_FLEISS_RATERS} - tot_pos)
                     * (n * {_FLEISS_RATERS} - tot_pos) AS DOUBLE)
                  / CAST(n * n * {_FLEISS_RATERS * _FLEISS_RATERS} AS DOUBLE))
           / (1 - CAST(tot_pos * tot_pos
                       + (n * {_FLEISS_RATERS} - tot_pos)
                         * (n * {_FLEISS_RATERS} - tot_pos) AS DOUBLE)
                      / CAST(n * n * {_FLEISS_RATERS * _FLEISS_RATERS}
                             AS DOUBLE)) AS fleiss_kappa
    FROM s
    """,
    tags=("X-fleiss",),
)
def fleiss_kappa_three_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) for THREE labeling functions (length,
    token count, distinct-token ratio) on the binary quality task —
    the multi-rater generalization of cohens_kappa_agreement, the
    standard check before majority-voting weak labels into a training
    gate (on this synthetic corpus the distinct-ratio rater
    ANTI-correlates with the two length gates — longer docs repeat more
    words — so kappa lands below zero: exactly the disagreement signal
    the audit exists to surface before votes are trusted). With m raters and binary categories, per-item agreement
    reduces algebraically to pos^2 terms: P_i = (pos*(pos-1) +
    (m-pos)*(m-pos-1)) / (m*(m-1)), so ONE aggregation carrying
    sum(pos) and sum(pos^2) determines P_bar exactly, and P_e comes
    from the two category marginals. Every term is an int64 ratio —
    engine-exact, no rounding.

    Distributed shape: one scan, one scalar hash aggregation with
    map-side combine; n^2 products stay inside int64 to ~3e9 docs per
    slice (moments merge additively across shards beyond)."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    m = _FLEISS_RATERS
    pos = (
        F.when(F.col("n_chars") >= _KAPPA_NCHARS, 1).otherwise(0)
        + F.when(F.size(ws) >= _KAPPA_NTOKS, 1).otherwise(0)
        + F.when(
            F.size(F.array_distinct(ws)).cast("double")
            / F.size(ws).cast("double")
            >= _FLEISS_RATIO,
            1,
        ).otherwise(0)
    ).alias("pos")
    s = docs.select(pos).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("tot_pos"),
        F.sum(F.col("pos") * F.col("pos")).cast("long").alias("s2"),
    )
    n, tp, s2 = F.col("n"), F.col("tot_pos"), F.col("s2")
    p_bar = (2 * s2 - 2 * m * tp + n * (m * (m - 1))).cast("double") / (
        n * (m * (m - 1))
    ).cast("double")
    neg = n * m - tp
    p_e = (tp * tp + neg * neg).cast("double") / (n * n * m * m).cast("double")
    return s.select(
        n.alias("n_docs"),
        F.lit(m).cast("int").alias("n_raters"),
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        ((p_bar - p_e) / (1 - p_e)).alias("fleiss_kappa"),
    )


# ---------------------------------------------------------------------------
# Pairwise Mann-Whitney U between source length distributions
# ---------------------------------------------------------------------------


@register(
    "mannwhitney_source_lengths",
    """
    WITH counts AS (
        SELECT source, n_chars AS x, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    support AS (SELECT DISTINCT x FROM counts),
    srcs AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1
    ),
    grid AS (
        SELECT s.source, s.n, sup.x, coalesce(c.c, 0) AS c
        FROM srcs s CROSS JOIN support sup
        LEFT JOIN counts c ON c.source = s.source AND c.x = sup.x
    ),
    cdf AS (
        SELECT source, n, x, c,
               CAST(sum(c) OVER (PARTITION BY source ORDER BY x) AS BIGINT)
                   AS cum
        FROM grid
    ),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(sum(a.c * (b.cum - b.c)) AS BIGINT) AS wins,
               CAST(sum(a.c * b.c) AS BIGINT) AS ties,
               a.n * b.n AS total
        FROM cdf a JOIN cdf b ON a.x = b.x AND a.source < b.source
        GROUP BY 1, 2, a.n, b.n
    )
    SELECT source_a, source_b,
           CAST(wins AS DOUBLE) + CAST(ties AS DOUBLE) / 2 AS u_stat,
           (CAST(wins AS DOUBLE) + CAST(ties AS DOUBLE) / 2)
               / CAST(total AS DOUBLE) AS auc
    FROM pairs
    """,
    tags=("X-mannwhitney",),
)
def mannwhitney_source_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Mann-Whitney U between per-source document-length
    distributions, reported as the AUC form P(X_a > X_b) + P(=)/2 —
    the nonparametric twin of ab_test_welch_t and the probability-scale
    complement to wasserstein_source_lengths (W1 measures HOW FAR the
    distributions sit apart; AUC measures how OFTEN one dominates).
    AUC ~ 0.5 means interchangeable length profiles. Computed on the
    zero-filled CDF GRID, never on value pairs: at each merged-support
    point x, wins += c_a(x) * #{b < x} = c_a(x) * (cum_b(x) - c_b(x)),
    so the pairing is an EQUI-join on the grid point (the naive
    a.x > b.x theta-join is a nested-loop cross of the count grids —
    measured 1.16 s vs 0.2 s for this form at sf0.1), and every term
    is an exact int64 product — two exact final doubles per pair.

    Distributed shape: one (source, length) count aggregation (the
    only data-grain pass, map-side combined), a |sources| x |support|
    zero-filled grid with per-source cumulative windows (the
    wasserstein_source_lengths construction), then one hash equi-join
    on x. Grid size is Heaps-bounded at any corpus scale."""
    docs = table(spark, sf_dir, "documents")
    from ..functions.lineage import truncate_lineage

    counts = truncate_lineage(
        docs.groupBy("source", F.col("n_chars").alias("x")).agg(
            F.count("*").cast("long").alias("c")
        ),
        eager=False,
    )  # consumed by support, srcs, the grid join
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
    )  # both sides of the pair equi-join read it
    a = cdf.alias("a")
    b = cdf.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.x") == F.col("b.x")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(
            F.sum(F.col("a.c") * (F.col("b.cum") - F.col("b.c")))
            .cast("long")
            .alias("wins"),
            F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("ties"),
        )
    )
    u = F.col("wins").cast("double") + F.col("ties").cast("double") / 2
    return pairs.select(
        "source_a",
        "source_b",
        u.alias("u_stat"),
        (u / (F.col("na") * F.col("nb")).cast("double")).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier retention curve over user activity spans
# ---------------------------------------------------------------------------

_KM_CHURN_GAP_DAYS = 3


@register(
    "kaplan_meier_retention",
    f"""
    WITH spans AS (
        SELECT user_id,
               CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) AS dur,
               CASE WHEN max(ts) < (SELECT max(ts) FROM events)
                                   - INTERVAL {_KM_CHURN_GAP_DAYS} DAY
                    THEN 1 ELSE 0 END AS churned
        FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM spans),
    per_t AS (
        SELECT dur AS t, CAST(count(*) AS BIGINT) AS n_ending,
               CAST(sum(churned) AS BIGINT) AS d
        FROM spans GROUP BY 1
    ),
    risk AS (
        SELECT t, d,
               tot.n_users
                 - coalesce(CAST(sum(n_ending) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS n_risk
        FROM per_t CROSS JOIN tot
    )
    SELECT t AS duration_days, n_risk, d AS n_churned,
           CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard,
           round(exp(sum(ln(1 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)))
                     OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 5)
               AS km_survival
    FROM risk
    """,
    tags=("X-kaplan-meier",),
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve (Kaplan & Meier 1958) over user
    activity spans: duration = days between a user's first and last
    event; a user whose last event predates the corpus horizon by more
    than {_KM_CHURN_GAP_DAYS} days counts as churned at that duration,
    later users are right-censored — the canonical retention read that
    naive "percent still active" curves get wrong by dropping censored
    users. n_at_risk descends by total-minus-prior-endings (one
    cumulative window over the duration-grain frame, never a per-user
    self-join); hazards are exact int64 ratios; the survival product is
    exp of the windowed ln sum — a DETERMINISTIC left-to-right order,
    rounded at the edge (bigram_lm precedent).

    Distributed shape: one user-grain aggregation (map-side combined)
    with the horizon as a broadcast scalar, then duration-grain frames
    (bounded by the observation window in days) with two k-bounded
    cumulative windows. One data-grain shuffle total."""
    ev = table(spark, sf_dir, "events")
    from ..functions.lineage import truncate_lineage

    horizon = ev.agg(F.max("ts").alias("h"))
    spans = truncate_lineage(
        ev.crossJoin(F.broadcast(horizon))
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("ts"), F.min("ts")).cast("long").alias("dur"),
            F.when(
                F.max("ts") < F.first("h") - F.expr(
                    f"INTERVAL {_KM_CHURN_GAP_DAYS} DAY"
                ),
                1,
            )
            .otherwise(0)
            .alias("churned"),
        ),
        eager=False,
    )  # consumed by tot and per_t
    tot = spans.agg(F.count("*").cast("long").alias("n_users"))
    per_t = spans.groupBy(F.col("dur").alias("t")).agg(
        F.count("*").cast("long").alias("n_ending"),
        F.sum("churned").cast("long").alias("d"),
    )
    w_prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_t.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (
            F.col("n_users")
            - F.coalesce(F.sum("n_ending").over(w_prior), F.lit(0))
        )
        .cast("long")
        .alias("n_risk"),
    )
    hazard = F.col("d").cast("double") / F.col("n_risk").cast("double")
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return risk.select(
        F.col("t").alias("duration_days"),
        "n_risk",
        F.col("d").alias("n_churned"),
        hazard.alias("hazard"),
        F.round(F.exp(F.sum(F.log(1 - hazard)).over(w_cum)), 5).alias(
            "km_survival"
        ),
    )


# ---------------------------------------------------------------------------
# A-priori frequent triples with level-wise pruning
# ---------------------------------------------------------------------------

_APRIORI_MINSUP_BP = 36  # threshold in basis points of baskets (0.36%)


@register(
    "frequent_triple_itemsets",
    f"""
    WITH items AS MATERIALIZED (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_b FROM items),
    minsup AS MATERIALIZED (
        SELECT CAST(n_b * {_APRIORI_MINSUP_BP} // 10000 AS BIGINT) AS ms,
                      n_b FROM n),
    l1 AS (
        SELECT p_brand, CAST(count(*) AS BIGINT) AS sup
        FROM items GROUP BY 1
        HAVING count(*) >= (SELECT ms FROM minsup)
    ),
    items1 AS MATERIALIZED (
        SELECT i.* FROM items i JOIN l1 ON l1.p_brand = i.p_brand),
    -- the oracle skips the L2 semi-join pruning: downward closure makes
    -- it value-neutral (any triple >= ms has all pairs >= ms), and the
    -- brute triple count is what PROVES the pruned plan lossless
    trips AS (
        SELECT a.p_brand AS ba, b.p_brand AS bb, c.p_brand AS bc,
               CAST(count(*) AS BIGINT) AS support
        FROM items1 a
        JOIN items1 b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        JOIN items1 c ON a.l_orderkey = c.l_orderkey AND b.p_brand < c.p_brand
        GROUP BY 1, 2, 3
        HAVING count(*) >= (SELECT ms FROM minsup)
    )
    SELECT t.ba AS brand_a, t.bb AS brand_b, t.bc AS brand_c, t.support,
           CAST(t.support AS DOUBLE) * m.n_b * m.n_b
               / (sa.sup * sb.sup * sc.sup) AS lift3
    FROM trips t
    JOIN l1 sa ON sa.p_brand = t.ba
    JOIN l1 sb ON sb.p_brand = t.bb
    JOIN l1 sc ON sc.p_brand = t.bc
    CROSS JOIN minsup m
    """,
    tags=("X-apriori",),
)
def frequent_triple_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-wise a-priori (Agrawal & Srikant 1994) to the TRIPLE level
    with a real min-support threshold ({_APRIORI_MINSUP_BP} basis
    points of baskets) — the pruning frequent_brand_pairs documents as a no-op at
    25 brands becomes LOAD-BEARING here: items below L1 never enter the
    pair join, and the triple join is semi-filtered by ALL THREE of its
    frequent pairs (the downward-closure property) before any counting.
    lift3 = P(abc) / (P(a)P(b)P(c)) as one exact int64 product ratio.

    Distributed shape: baskets dedupe once; every level is a
    basket-keyed equi-join (never all-pairs across baskets); L1/L2 are
    dimension-sized and broadcast into the candidate joins, so the only
    data-grain shuffles are the level-wise support counts. This is
    exactly how a-priori distributes at 100 TB — the candidate
    explosion is bounded by the downward-closure pruning, not by the
    item-space size."""
    from ..functions.lineage import truncate_lineage

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = truncate_lineage(
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct(),
        eager=False,
    )  # consumed by n, l1, and the level joins
    n = items.agg(F.countDistinct("l_orderkey").cast("long").alias("n_b"))
    minsup = n.select(
        F.floor(F.col("n_b") * _APRIORI_MINSUP_BP / 10000).cast("long").alias("ms"),
        "n_b",
    )
    l1 = truncate_lineage(
        items.groupBy("p_brand")
        .agg(F.count("*").cast("long").alias("sup"))
        .crossJoin(F.broadcast(minsup))
        .filter(F.col("sup") >= F.col("ms"))
        .select("p_brand", "sup"),
        eager=False,
    )
    items1 = items.join(
        F.broadcast(l1.select("p_brand")), "p_brand"
    ).select("l_orderkey", "p_brand")
    a = items1.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("ba"))
    b = items1.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("bb"))
    c = items1.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("bc"))
    l2 = truncate_lineage(
        a.join(b, "k")
        .filter(F.col("ba") < F.col("bb"))
        .groupBy("ba", "bb")
        .agg(F.count("*").cast("long").alias("sup"))
        .crossJoin(F.broadcast(minsup.select("ms")))
        .filter(F.col("sup") >= F.col("ms"))
        .select("ba", "bb"),
        eager=False,
    )
    trips = (
        a.join(b, "k")
        .filter(F.col("ba") < F.col("bb"))
        .join(c, "k")
        .filter(F.col("bb") < F.col("bc"))
        .join(F.broadcast(l2), ["ba", "bb"])
        .join(
            F.broadcast(l2.select(F.col("ba").alias("ba"), F.col("bb").alias("bc"))),
            ["ba", "bc"],
        )
        .join(
            F.broadcast(l2.select(F.col("ba").alias("bb"), F.col("bb").alias("bc"))),
            ["bb", "bc"],
        )
        .groupBy("ba", "bb", "bc")
        .agg(F.count("*").cast("long").alias("support"))
        .crossJoin(F.broadcast(minsup.select("ms")))
        .filter(F.col("support") >= F.col("ms"))
    )
    sa = l1.select(F.col("p_brand").alias("ba"), F.col("sup").alias("sup_a"))
    sb = l1.select(F.col("p_brand").alias("bb"), F.col("sup").alias("sup_b"))
    sc = l1.select(F.col("p_brand").alias("bc"), F.col("sup").alias("sup_c"))
    return (
        trips.join(F.broadcast(sa), "ba")
        .join(F.broadcast(sb), "bb")
        .join(F.broadcast(sc), "bc")
        .crossJoin(F.broadcast(minsup.select("n_b")))
        .select(
            F.col("ba").alias("brand_a"),
            F.col("bb").alias("brand_b"),
            F.col("bc").alias("brand_c"),
            "support",
            (
                F.col("support").cast("double")
                * F.col("n_b")
                * F.col("n_b")
                / (F.col("sup_a") * F.col("sup_b") * F.col("sup_c"))
            ).alias("lift3"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast revenue change (pure pushdown showcase)
# ---------------------------------------------------------------------------


@register(
    "revenue_change_forecast",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS forecast_revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("Q6",),
)
def revenue_change_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical
    predicate-pushdown benchmark — a single scan whose FOUR conjunctive
    predicates (date range, discount band, quantity cap) must all reach
    the parquet reader as PushedFilters, followed by one scalar
    aggregation with map-side combine. No shuffle of data-grain rows,
    no join; at 100 TB the date predicate additionally prunes
    partitions when the table is shipdate-partitioned. Sum rounded at
    the edge (the pricing_summary_report precedent for double money
    columns).

    Was the one classic TPC-H shape still missing from the OLAP suite
    (Q1/Q3-Q5/Q7-Q10/Q12-Q15/Q17-Q19/Q21-Q22 analogs are in
    plans/olap.py; Q2/Q11/Q16/Q20 need the partsupp table the testdata
    does not ship)."""
    li = table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "forecast_revenue"
        ),
        F.count("*").cast("long").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend over daily event volume
# ---------------------------------------------------------------------------


@register(
    "theil_sen_trend",
    """
    WITH daily AS (
        SELECT CAST(date_diff('day',
                   (SELECT min(CAST(ts AS DATE)) FROM events),
                   CAST(ts AS DATE)) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    slopes AS (
        SELECT a.d AS d1, b.d AS d2,
               CAST(b.n - a.n AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS s
        FROM daily a JOIN daily b ON a.d < b.d
    ),
    ranked AS (
        SELECT s, ROW_NUMBER() OVER (ORDER BY s, d1, d2) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM slopes
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           m AS n_pairs,
           s AS theil_sen_slope
    FROM ranked
    WHERE rn = (m + 1) // 2
    """,
    tags=("X-theil-sen",),
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator (Theil 1950; Sen 1968) of the daily
    event-volume trend: the MEDIAN of all pairwise slopes — robust to
    ~29% outliers where the OLS slope (vocab_zipf_fit's regression
    machinery) is wrecked by one anomalous day. Slopes are exact int64
    difference ratios; the median is the ORDER STATISTIC at rank
    ceil(m/2) (lower median, tie-broken by day pair — no interpolation
    formula, engine-exact like bootstrap_ci_mean). The pairwise frame
    is day-grain squared — days, not rows, so it is calendar-bounded
    (a decade is ~6.7M pairs) at ANY corpus size; the only data-grain
    pass is the daily count aggregation.

    Distributed shape: one map-combined daily aggregation, a
    day-grain self-join (bounded), one rank sort of the slope frame."""
    ev = table(spark, sf_dir, "events")
    from ..functions.lineage import truncate_lineage

    d0 = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    daily = truncate_lineage(
        ev.crossJoin(F.broadcast(d0))
        .groupBy(F.datediff(F.to_date("ts"), F.col("d0")).cast("long").alias("d"))
        .agg(F.count("*").cast("long").alias("n")),
        eager=False,
    )  # consumed by both sides of the pair join and the n_days scalar
    a = daily.select(F.col("d").alias("d1"), F.col("n").alias("n1"))
    b = daily.select(F.col("d").alias("d2"), F.col("n").alias("n2"))
    slopes = a.join(b, F.col("d1") < F.col("d2")).select(
        "d1",
        "d2",
        (
            (F.col("n2") - F.col("n1")).cast("double")
            / (F.col("d2") - F.col("d1")).cast("double")
        ).alias("s"),
    )
    ranked = slopes.select(
        "s",
        F.row_number().over(Window.orderBy("s", "d1", "d2")).alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("m"),
    )
    nd = daily.agg(F.count("*").cast("long").alias("n_days"))
    return (
        ranked.filter(F.col("rn") == F.floor((F.col("m") + 1) / 2))
        .crossJoin(F.broadcast(nd))
        .select("n_days", F.col("m").alias("n_pairs"), F.col("s").alias("theil_sen_slope"))
    )


# ---------------------------------------------------------------------------
# word2vec-style frequent-token subsampling plan (Mikolov et al. 2013)
# ---------------------------------------------------------------------------

_W2V_T = 1e-3  # subsampling threshold


@register(
    "word2vec_subsampling_plan",
    f"""
    WITH counts AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
        GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM counts),
    p AS (
        SELECT tok, c,
               CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS f,
               least(1.0, sqrt({_W2V_T} / (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
                          + {_W2V_T} / (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
                   AS p_keep
        FROM counts CROSS JOIN tot
    )
    SELECT tok AS token, c AS cnt, f AS freq_share, p_keep,
           CAST(round(c * p_keep, 0) AS BIGINT) AS expected_kept
    FROM p
    ORDER BY c DESC, tok
    LIMIT 20
    """,
    tags=("X-subsampling",),
)
def word2vec_subsampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-token subsampling plan (Mikolov et al. 2013 §2.3, the
    word2vec heuristic modern corpus pipelines reuse to down-weight
    stop-token mass): p_keep(w) = min(1, sqrt(t/f) + t/f) with
    t = 1e-3. Per-token expected survivors round to integers per row
    (both engines compute the identical exact double first — IEEE sqrt
    and division are exactly rounded, so no accumulation ever crosses
    engines), reported for the top-20 tokens by count with total
    tiebreak.

    Distributed shape: one token-grain count aggregation (map-side
    combined), corpus total as a broadcast scalar, per-row closed-form
    math, TakeOrderedAndProject top-20 — no full vocabulary sort."""
    docs = table(spark, sf_dir, "documents")
    from ..functions.lineage import truncate_lineage

    counts = truncate_lineage(
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c")),
        eager=False,
    )  # consumed by the total and the per-token plan
    tot = counts.agg(F.sum("c").cast("long").alias("n"))
    f = F.col("c").cast("double") / F.col("n").cast("double")
    p_keep = F.least(F.lit(1.0), F.sqrt(_W2V_T / f) + _W2V_T / f)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("tok").alias("token"),
            F.col("c").alias("cnt"),
            f.alias("freq_share"),
            p_keep.alias("p_keep"),
            F.round(F.col("c") * p_keep, 0).cast("long").alias("expected_kept"),
        )
        .orderBy(F.desc("cnt"), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# ROC AUC of the quality confidence score against the binary label
# ---------------------------------------------------------------------------


@register(
    "quality_score_roc_auc",
    f"""
    WITH m AS (
        SELECT CASE WHEN n_chars >= {_CAL_NCHARS} THEN 1 ELSE 0 END AS pos,
               CAST(round(CAST(len(list_distinct(ws)) AS DOUBLE)
                          / CAST(len(ws) AS DOUBLE) * {_CAL_SCALE}, 0)
                    AS BIGINT) AS s_m
        FROM (SELECT n_chars, string_split(lower(text), ' ') AS ws FROM documents)
    ),
    counts AS (
        SELECT s_m, CAST(sum(pos) AS BIGINT) AS cp,
               CAST(count(*) - sum(pos) AS BIGINT) AS cn
        FROM m GROUP BY 1
    ),
    cdf AS (
        SELECT s_m, cp, cn,
               CAST(sum(cn) OVER (ORDER BY s_m) AS BIGINT) AS cum_n
        FROM counts
    ),
    tot AS (
        SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cn) AS BIGINT) AS nn
        FROM counts
    )
    SELECT tot.np AS n_pos, tot.nn AS n_neg,
           CAST(sum(cp * (cum_n - cn)) AS DOUBLE) / CAST(tot.np * tot.nn AS DOUBLE)
               + CAST(sum(cp * cn) AS DOUBLE) / CAST(2 * tot.np * tot.nn AS DOUBLE)
               AS roc_auc
    FROM cdf CROSS JOIN tot
    GROUP BY tot.np, tot.nn
    """,
    tags=("X-roc-auc",),
)
def quality_score_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the distinct-token-ratio quality score against the
    length label — the single-number discrimination check that pairs
    with calibration_ece_bins (calibration) and isotonic repair: AUC is
    P(score_pos > score_neg) + P(=)/2, i.e. the Mann-Whitney statistic
    between the positive and negative score distributions. Computed on
    the fixed-point VALUE-COUNT grid (scores quantized at 1e-6, the
    calibration family's scale): wins = sum over score values of
    pos_count * negatives_below (one cumulative window), ties get half
    credit — every term an exact int64 product, one exact final
    division. The naive per-pair comparison (n_pos x n_neg rows) never
    materializes at any scale.

    Distributed shape: one scan + one score-grain aggregation
    (Heaps-bounded support), a cumulative window over the support, one
    scalar aggregation."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    from ..functions.lineage import truncate_lineage

    m = docs.select(
        F.when(F.col("n_chars") >= _CAL_NCHARS, 1).otherwise(0).alias("pos"),
        F.round(
            F.size(F.array_distinct(ws)).cast("double")
            / F.size(ws).cast("double")
            * _CAL_SCALE,
            0,
        )
        .cast("long")
        .alias("s_m"),
    )
    counts = truncate_lineage(
        m.groupBy("s_m").agg(
            F.sum("pos").cast("long").alias("cp"),
            (F.count("*") - F.sum("pos")).cast("long").alias("cn"),
        ),
        eager=False,
    )  # consumed by the cdf window and the totals
    cdf = counts.select(
        "cp",
        "cn",
        F.sum("cn")
        .over(Window.orderBy("s_m").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_n"),
    )
    tot = counts.agg(
        F.sum("cp").cast("long").alias("np"), F.sum("cn").cast("long").alias("nn")
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .groupBy("np", "nn")
        .agg(
            F.sum(F.col("cp") * (F.col("cum_n") - F.col("cn")))
            .cast("long")
            .alias("wins"),
            F.sum(F.col("cp") * F.col("cn")).cast("long").alias("ties"),
        )
        .select(
            F.col("np").alias("n_pos"),
            F.col("nn").alias("n_neg"),
            (
                F.col("wins").cast("double")
                / (F.col("np") * F.col("nn")).cast("double")
                + F.col("ties").cast("double")
                / (2 * F.col("np") * F.col("nn")).cast("double")
            ).alias("roc_auc"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding hubness audit: k-occurrence distribution (Radovanovic 2010)
# ---------------------------------------------------------------------------

_HUB_K = 5


@register(
    "embedding_hubness_koccurrence",
    f"""
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               round(list_sum(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos_sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    topk AS (
        SELECT dst FROM (
            SELECT dst, ROW_NUMBER() OVER (PARTITION BY src
                        ORDER BY cos_sim DESC, dst) AS rn
            FROM scored
        ) WHERE rn <= {_HUB_K}
    ),
    occ AS (
        SELECT e.vec_id,
               coalesce(o.c, 0) AS k_occ
        FROM e LEFT JOIN (SELECT dst, CAST(count(*) AS BIGINT) AS c
                          FROM topk GROUP BY 1) o
          ON o.dst = e.vec_id
    ),
    hist AS (
        SELECT k_occ, CAST(count(*) AS BIGINT) AS n_vectors
        FROM occ GROUP BY 1
    ),
    mom AS (
        SELECT CAST(sum(n_vectors) AS BIGINT) AS n,
               CAST(sum(k_occ * n_vectors) AS BIGINT) AS s1,
               CAST(sum(k_occ * k_occ * n_vectors) AS BIGINT) AS s2,
               CAST(sum(k_occ * k_occ * k_occ * n_vectors) AS BIGINT) AS s3
        FROM hist
    )
    SELECT h.k_occ, h.n_vectors,
           round((CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
                  * CAST(m.n * m.s3 - 3 * m.s1 * m.s2 AS DOUBLE)
                  + 2 * CAST(m.s1 AS DOUBLE) * CAST(m.s1 AS DOUBLE)
                      * CAST(m.s1 AS DOUBLE))
                 / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
                    * CAST(m.n AS DOUBLE))
                 / pow(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE)
                       / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)), 1.5),
                 5) AS occ_skewness
    FROM hist h CROSS JOIN mom m
    """,
    tags=("X-hubness",),
)
def embedding_hubness_koccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit (Radovanovic et al. 2010): the k-occurrence
    histogram — how many vectors appear in exactly o other vectors'
    cosine top-{_HUB_K} — plus its skewness, THE summary statistic for
    hub pathology in high-dimensional retrieval (skew >> 0 means a few
    hub vectors dominate everyone's neighbor lists and mutual-kNN /
    margin corrections are mandatory; see mutual_knn_pairs and
    margin_bitext_mining, which exist to counter exactly this).
    Zero-occurrence vectors enter via a left join from the vector
    frame (anti-hubs are the other half of the pathology). Skewness is
    the third standardized CENTRAL moment assembled from raw integer
    moments (n^2(n*s3 - 3*s1*s2) + 2*s1^3)/n^3 over variance^1.5 —
    doubles only in the final expression, rounded at the edge.

    Distributed shape: the pair scan is CELL-RESTRICTED (label =
    IVF cell, the mutual_knn_pairs / ann_ivf_label_topk pattern) with
    hoisted per-vector norms; the per-src top-k compiles to
    WindowGroupLimit; k-occurrence counting and the histogram are
    k*n-bounded aggregations; the moment row is a broadcast scalar."""
    from ..functions.lineage import truncate_lineage
    from ..operators.similarity import _dot, _norm

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    a = emb.select(
        "label",
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("emb_a"),
        _norm(F.col("embedding")).alias("norm_a"),
    )
    b = emb.select(
        F.col("label").alias("label"),
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("emb_b"),
        _norm(F.col("embedding")).alias("norm_b"),
    )
    scored = (
        a.join(b, "label")
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.round(
                _dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("norm_a") * F.col("norm_b")),
                4,
            ).alias("cos_sim"),
        )
    )
    topk = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.desc("cos_sim"), "dst")
            ),
        )
        .filter(F.col("rn") <= _HUB_K)
        .select("dst")
    )
    occ_counts = topk.groupBy("dst").agg(F.count("*").cast("long").alias("c"))
    occ = emb.select("vec_id").join(
        occ_counts, emb.vec_id == occ_counts.dst, "left"
    ).select(F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("k_occ"))
    hist = truncate_lineage(
        occ.groupBy("k_occ").agg(F.count("*").cast("long").alias("n_vectors")),
        eager=False,
    )  # consumed by the moment scalar and the final rows
    mom = hist.agg(
        F.sum("n_vectors").cast("long").alias("n"),
        F.sum(F.col("k_occ") * F.col("n_vectors")).cast("long").alias("s1"),
        F.sum(F.col("k_occ") * F.col("k_occ") * F.col("n_vectors"))
        .cast("long")
        .alias("s2"),
        F.sum(F.col("k_occ") * F.col("k_occ") * F.col("k_occ") * F.col("n_vectors"))
        .cast("long")
        .alias("s3"),
    )
    n_d = F.col("n").cast("double")
    m3 = (
        n_d * n_d * (F.col("n") * F.col("s3") - 3 * F.col("s1") * F.col("s2")).cast("double")
        + 2 * F.col("s1").cast("double") * F.col("s1").cast("double")
        * F.col("s1").cast("double")
    ) / (n_d * n_d * n_d)
    var = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double") / (
        n_d * n_d
    )
    return hist.crossJoin(F.broadcast(mom)).select(
        "k_occ",
        "n_vectors",
        F.round(m3 / F.pow(var, 1.5), 5).alias("occ_skewness"),
    )


# ---------------------------------------------------------------------------
# Split-conformal coverage audit (Vovk et al. 2005; Angelopoulos 2023)
# ---------------------------------------------------------------------------

_CONF_ALPHA_PCT = 10  # target miscoverage: 10% -> 90% intervals


@register(
    "conformal_quantile_coverage",
    f"""
    WITH scored AS (
        SELECT doc_id,
               abs(n_chars - 150) AS nonconf,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':conf'), 1, 8))
                   ::BIGINT % 2 = 0 AS is_calib
        FROM documents
    ),
    calib AS (
        SELECT nonconf, ROW_NUMBER() OVER (ORDER BY nonconf, doc_id) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS nc
        FROM (SELECT doc_id, nonconf FROM scored WHERE is_calib)
    ),
    qhat AS (
        SELECT nonconf AS q, nc FROM calib
        WHERE rn = least(nc, CAST(ceil((nc + 1) * (100 - {_CONF_ALPHA_PCT})
                                       / 100.0) AS BIGINT))
    )
    SELECT qhat.nc AS n_calib,
           CAST(count(*) AS BIGINT) AS n_test,
           qhat.q AS q_hat,
           CAST(sum(CASE WHEN s.nonconf <= qhat.q THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered,
           CAST(sum(CASE WHEN s.nonconf <= qhat.q THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS coverage
    FROM scored s CROSS JOIN qhat
    WHERE NOT s.is_calib
    GROUP BY qhat.nc, qhat.q
    """,
    tags=("X-conformal",),
)
def conformal_quantile_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal coverage audit (Vovk et al. 2005; the modern
    recipe of Angelopoulos & Bates 2023): hash-split the corpus into
    calibration and test halves, take q-hat as the ceil((n+1)(1-alpha))
    ORDER STATISTIC of the calibration nonconformity scores
    (|n_chars - 150| as the score), and report empirical test coverage
    — the finite-sample guarantee says coverage >= 1 - alpha in
    expectation, and this query is the audit that checks it on real
    data before conformal thresholds gate a production filter. The
    split is the portable-md5 hash family (deterministic on both
    engines), q-hat is an exact order statistic (no interpolation), and
    coverage is an exact integer ratio.

    Distributed shape: one scan computing score + split bit, one rank
    sort of the calibration half (at 100 TB: approx-quantile with the
    same downstream algebra, the spearman precedent), q-hat broadcast
    to the streaming test half — one scalar aggregation, no data-grain
    join."""
    docs = table(spark, sf_dir, "documents")
    from ..functions.lineage import truncate_lineage

    scored = truncate_lineage(
        docs.select(
            "doc_id",
            F.abs(F.col("n_chars") - 150).alias("nonconf"),
            (
                F.expr(
                    "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING),"
                    " ':conf')), 1, 8), 16, 10) AS BIGINT)"
                )
                % 2
                == 0
            ).alias("is_calib"),
        ),
        eager=False,
    )  # consumed by the calibration rank and the test aggregation
    calib = scored.filter(F.col("is_calib")).select(
        "nonconf",
        F.row_number().over(Window.orderBy("nonconf", "doc_id")).alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("nc"),
    )
    qhat = calib.filter(
        F.col("rn")
        == F.least(
            F.col("nc"),
            F.ceil((F.col("nc") + 1) * (100 - _CONF_ALPHA_PCT) / 100.0).cast("long"),
        )
    ).select(F.col("nonconf").alias("q"), "nc")
    covered = F.sum(
        F.when(F.col("nonconf") <= F.col("q"), 1).otherwise(0)
    ).cast("long")
    return (
        scored.filter(~F.col("is_calib"))
        .crossJoin(F.broadcast(qhat))
        .groupBy("nc", "q")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            covered.alias("n_covered"),
        )
        .select(
            F.col("nc").alias("n_calib"),
            "n_test",
            F.col("q").alias("q_hat"),
            "n_covered",
            (F.col("n_covered").cast("double") / F.col("n_test").cast("double")).alias(
                "coverage"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Pairwise top-k vocabulary overlap between sources
# ---------------------------------------------------------------------------

_VOCAB_OVL_K = 50


@register(
    "vocab_overlap_matrix",
    f"""
    WITH counts AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
        GROUP BY 1, 2
    ),
    topk AS (
        SELECT source, tok FROM (
            SELECT source, tok, ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY c DESC, tok) AS rn
            FROM counts
        ) WHERE rn <= {_VOCAB_OVL_K}
    ),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS k FROM topk GROUP BY 1),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM topk a JOIN topk b
          ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, i.n_common,
           CAST(i.n_common AS DOUBLE)
               / CAST(sa.k + sb.k - i.n_common AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
    tags=("X-vocab-overlap",),
)
def vocab_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard overlap of each source's top-{_VOCAB_OVL_K}
    vocabulary — the cheap screen for tokenizer transfer and mixture
    redundancy (sources whose head vocabularies coincide share a
    tokenizer and dilute each other in a mixture; low-overlap sources
    need vocab budget). Top-k per source is a keyed window
    (WindowGroupLimit — only candidate rows shuffle); the pair
    intersection is an EQUI-join on the token (never a per-source-pair
    theta join — the mannwhitney lesson), sized k * |sources|, and
    Jaccard is an exact int64 ratio via |A|+|B|-|A∩B|.

    Distributed shape: one (source, token) count shuffle (map-side
    combined), a per-source top-k window, then joins over frames
    bounded by k x |sources| at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    from ..functions.lineage import truncate_lineage

    counts = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).groupBy("source", "tok").agg(F.count("*").cast("long").alias("c"))
    topk = truncate_lineage(
        counts.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.desc("c"), "tok")
            ),
        )
        .filter(F.col("rn") <= _VOCAB_OVL_K)
        .select("source", "tok"),
        eager=False,
    )  # consumed by sizes and both sides of the intersection join
    sizes = topk.groupBy("source").agg(F.count("*").cast("long").alias("k"))
    a = topk.select(F.col("source").alias("source_a"), "tok")
    b = topk.select(F.col("source").alias("source_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("k").alias("ka"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("k").alias("kb"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("ka") + F.col("kb") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Split-half vocabulary rank stability (Spearman between corpus halves)
# ---------------------------------------------------------------------------


@register(
    "split_half_vocab_stability",
    """
    WITH halves AS (
        SELECT CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS half,
               tok
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
    ),
    counts AS (
        SELECT tok,
               CAST(sum(CASE WHEN half = 'even' THEN 1 ELSE 0 END) AS BIGINT)
                   AS ce,
               CAST(sum(CASE WHEN half = 'odd' THEN 1 ELSE 0 END) AS BIGINT)
                   AS co
        FROM halves GROUP BY 1
    ),
    r AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY ce DESC, tok) AS BIGINT) AS rx,
               CAST(ROW_NUMBER() OVER (ORDER BY co DESC, tok) AS BIGINT) AS ry
        FROM counts
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
               CAST(sum(rx * rx) AS BIGINT) AS sxx,
               CAST(sum(ry * ry) AS BIGINT) AS syy,
               CAST(sum(rx * ry) AS BIGINT) AS sxy
        FROM r
    )
    SELECT n AS n_tokens,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 5)
               AS rank_stability_rho
    FROM s
    """,
    tags=("X-split-half",),
)
def split_half_vocab_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-half reliability of the vocabulary ranking: Spearman rank
    correlation between token frequency ranks computed on the even-id
    and odd-id document halves — the classic psychometric reliability
    check applied to corpus statistics. rho near 1 says frequency-based
    decisions (vocab truncation, subsampling thresholds, BPE merge
    order) are stable to resampling; a low rho flags a heterogeneous
    or too-small corpus whose head vocabulary is an artifact of the
    split. Same integer-exact rank-moment algebra as
    quality_metric_spearman: both half-counts ride ONE aggregation
    (conditional sums — no second corpus pass), ranks are total orders
    via token tiebreak, every aggregate an int64 sum, one rounded
    division at the edge.

    Distributed shape: one token explode into a (token, half-counts)
    aggregation (map-side combined), two vocabulary-grain rank sorts
    (Heaps-bounded), one scalar moment row."""
    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .groupBy("tok")
        .agg(
            F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("ce"),
            F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("co"),
        )
    )
    r = counts.select(
        F.row_number().over(Window.orderBy(F.desc("ce"), "tok")).cast("long").alias("rx"),
        F.row_number().over(Window.orderBy(F.desc("co"), "tok")).cast("long").alias("ry"),
    )
    s = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return s.select(
        F.col("n").alias("n_tokens"),
        F.round(num / den, 5).alias("rank_stability_rho"),
    )


# ---------------------------------------------------------------------------
# Circular peak hour per event type (directional statistics)
# ---------------------------------------------------------------------------


@register(
    "circular_peak_hour",
    """
    WITH hourly AS (
        SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS h,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    vec AS (
        SELECT event_type,
               CAST(sum(c) AS BIGINT) AS n,
               sum(c * cos(h * 2 * pi() / 24)) AS sx,
               sum(c * sin(h * 2 * pi() / 24)) AS sy
        FROM hourly GROUP BY 1
    )
    SELECT event_type, n AS n_events,
           round((CASE WHEN atan2(sy, sx) < 0
                       THEN atan2(sy, sx) + 2 * pi()
                       ELSE atan2(sy, sx) END) * 24 / (2 * pi()), 4)
               AS peak_hour,
           round(sqrt(sx * sx + sy * sy) / n, 5) AS concentration_r
    FROM vec
    """,
    tags=("X-circular-stats",),
)
def circular_peak_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular mean peak hour per event type (directional statistics,
    Mardia & Jupp 2000): hours live on a circle, so the arithmetic mean
    of {23, 0, 1} is a nonsense 8 — the mean RESULTANT VECTOR
    (sum of unit vectors at angle 2*pi*h/24) gives the true peak
    direction, and its normalized length R in [0, 1] is the
    concentration (R ~ 0: uniform around the clock; R ~ 1: sharply
    peaked) — the correct way to compare diurnal load shapes across
    event types. The trig arguments take only 24 DISTINCT values
    because counts aggregate to hour grain FIRST; the 24-term
    transcendental sums per type are rounded at the edge
    (bigram_lm precedent).

    Distributed shape: one (type, hour) count aggregation — the only
    data-grain pass, map-side combined — then per-type math over <= 24
    rows each. Bounded by the clock at any corpus size."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("h")
    ).agg(F.count("*").cast("long").alias("c"))
    two_pi = 2 * math.pi
    vec = hourly.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.cos(F.col("h") * two_pi / 24)).alias("sx"),
        F.sum(F.col("c") * F.sin(F.col("h") * two_pi / 24)).alias("sy"),
    )
    ang = F.atan2(F.col("sy"), F.col("sx"))
    ang_pos = F.when(ang < 0, ang + two_pi).otherwise(ang)
    return vec.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.round(ang_pos * 24 / two_pi, 4).alias("peak_hour"),
        F.round(
            F.sqrt(F.col("sx") * F.col("sx") + F.col("sy") * F.col("sy"))
            / F.col("n"),
            5,
        ).alias("concentration_r"),
    )


# ---------------------------------------------------------------------------
# Corpus entropy rate: unigram vs bigram conditional entropy
# ---------------------------------------------------------------------------


@register(
    "corpus_entropy_rate",
    """
    WITH toks AS (
        SELECT string_split(lower(text), ' ') AS ws FROM documents
        ),
    uni AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY 1
    ),
    n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
    h1 AS (
        SELECT round(-sum((CAST(c AS DOUBLE) / n)
                          * log2(CAST(c AS DOUBLE) / n)), 5) AS h_unigram
        FROM uni CROSS JOIN n1
    ),
    bi AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT ws[i] AS w1, ws[i + 1] AS w2
              FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
                    FROM toks WHERE len(ws) >= 2))
        GROUP BY 1, 2
    ),
    n2 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bi),
    h2 AS (
        SELECT round(-sum((CAST(c AS DOUBLE) / n)
                          * log2(CAST(c AS DOUBLE) / n)), 5) AS h_bigram
        FROM bi CROSS JOIN n2
    )
    SELECT (SELECT n FROM n1) AS n_tokens,
           h1.h_unigram,
           h2.h_bigram,
           round(h2.h_bigram - h1.h_unigram, 5) AS h_conditional
    FROM h1 CROSS JOIN h2
    """,
    tags=("X-entropy-rate",),
)
def corpus_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus entropy rate: unigram entropy H(W), bigram entropy
    H(W1,W2), and the conditional entropy H(W2|W1) = H(W1,W2) - H(W1)
    in bits — the information-theoretic predictability summary
    (Shannon 1951's printed-English estimate pattern) that complements
    the per-doc views (doc_word_entropy, bigram_lm_cross_entropy): a
    low conditional entropy means bigram context already pins the next
    token and longer-context models gain little on this corpus. All
    probabilities are exact int64 ratios; the p*log2(p) sums run at
    vocabulary/bigram grain and round at the edge (bigram_lm
    precedent).

    Distributed shape: one token explode and one zip_with bigram
    explode, each into a map-side-combined count aggregation; the
    entropy folds run at Heaps-bounded grains with corpus totals as
    broadcast scalars."""
    docs = table(spark, sf_dir, "documents")
    from ..functions.lineage import truncate_lineage

    ws = F.split(F.lower("text"), " ")
    toks = truncate_lineage(docs.select(ws.alias("ws")), eager=False)
    uni = toks.select(F.explode("ws").alias("w")).groupBy("w").agg(
        F.count("*").cast("long").alias("c")
    )
    uni = truncate_lineage(uni, eager=False)
    n1 = uni.agg(F.sum("c").cast("long").alias("n"))
    p1 = F.col("c").cast("double") / F.col("n").cast("double")
    h1 = (
        uni.crossJoin(F.broadcast(n1))
        .agg(F.round(-F.sum(p1 * F.log2(p1)), 5).alias("h_unigram"))
        .crossJoin(F.broadcast(n1))
    )
    bi = (
        toks.filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("g")
        )
        .groupBy("g")
        .agg(F.count("*").cast("long").alias("c"))
    )
    bi = truncate_lineage(bi, eager=False)
    n2 = bi.agg(F.sum("c").cast("long").alias("n"))
    p2 = F.col("c").cast("double") / F.col("n").cast("double")
    h2 = bi.crossJoin(F.broadcast(n2)).agg(
        F.round(-F.sum(p2 * F.log2(p2)), 5).alias("h_bigram")
    )
    return (
        h1.crossJoin(F.broadcast(h2))
        .select(
            F.col("n").alias("n_tokens"),
            "h_unigram",
            "h_bigram",
            F.round(F.col("h_bigram") - F.col("h_unigram"), 5).alias(
                "h_conditional"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Source-level MinHash similarity matrix
# ---------------------------------------------------------------------------

_SRC_MH_K = 32  # permutations; b_hex=14 keeps (k-1)*b + a inside int64


@register(
    "source_minhash_similarity",
    f"""
    WITH toks AS (
        SELECT source, string_split(lower(text), ' ') AS ws FROM documents
    ),
    sh AS (
        SELECT DISTINCT source,
               ('0x' || substr(md5(gram), 1, 15))::BIGINT AS a,
               ('0x' || substr(md5(gram), 16, 14))::BIGINT AS b
        FROM (SELECT source,
                     array_to_string(list_transform(
                         generate_series(i, i + 3), j -> ws[j]), ' ') AS gram
              FROM (SELECT source, ws, unnest(generate_series(1, len(ws) - 3))
                           AS i
                    FROM toks WHERE len(ws) >= 4))
    ),
    sigs AS (
        SELECT source, g.i,
               CAST(min((a + g.i * b) % 1152921504606846976) AS BIGINT) AS mv
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {_SRC_MH_K - 1}))
                            AS i) g
        GROUP BY 1, 2
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(sum(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END) AS BIGINT)
               AS n_matching,
           CAST(sum(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END) AS DOUBLE)
               / {float(_SRC_MH_K)} AS jaccard_est
    FROM sigs a JOIN sigs b ON a.i = b.i AND a.source < b.source
    GROUP BY 1, 2
    """,
    tags=("X-source-minhash",),
)
def source_minhash_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level MinHash similarity matrix: one {_SRC_MH_K}-permutation
    signature per SOURCE over the union of its documents' word-4-shingles,
    pairwise Jaccard estimated as the fraction of agreeing permutations —
    the set-similarity screen for "is source B a scrape/clone of source A"
    that runs BEFORE any doc-level dedup pays per-pair cost. Same
    Carter-Wegman one-md5-per-shingle family as minhash_signatures
    (operators/dedup.py:91) at b_hex=14 so k={_SRC_MH_K} permutations stay
    inside int64; the estimate is an exact integer ratio of agreement
    counts.

    Distributed shape: shingles dedupe at (source, shingle) grain
    map-side, permutations ride as cheap integer arithmetic on ONE md5,
    the signature is a (source, i)-grain min aggregation, and the pair
    matrix is an equi-join on the permutation index over a
    |sources| x k frame — never a shingle-set cross join."""
    docs = table(spark, sf_dir, "documents")
    from ..functions.lineage import truncate_lineage

    ws = F.split(F.lower("text"), " ")
    grams = (
        docs.select("source", ws.alias("ws"))
        .filter(F.size("ws") >= 4)
        .select(
            "source",
            F.explode(
                F.zip_with(
                    F.zip_with(
                        F.slice(F.col("ws"), 1, F.size("ws") - 3),
                        F.slice(F.col("ws"), 2, F.size("ws") - 3),
                        lambda a, b: F.concat(a, F.lit(" "), b),
                    ),
                    F.zip_with(
                        F.slice(F.col("ws"), 3, F.size("ws") - 3),
                        F.slice(F.col("ws"), 4, F.size("ws") - 3),
                        lambda c, d: F.concat(c, F.lit(" "), d),
                    ),
                    lambda l, r: F.concat(l, F.lit(" "), r),
                )
            ).alias("gram"),
        )
    )
    sh = grams.select(
        "source",
        F.expr("CAST(conv(substring(md5(gram), 1, 15), 16, 10) AS BIGINT)").alias(
            "a"
        ),
        F.expr("CAST(conv(substring(md5(gram), 16, 14), 16, 10) AS BIGINT)").alias(
            "b"
        ),
    ).distinct()
    sigs = truncate_lineage(
        sh.select(
            "source",
            "a",
            "b",
            F.explode(F.sequence(F.lit(0), F.lit(_SRC_MH_K - 1))).alias("i"),
        )
        .groupBy("source", "i")
        .agg(
            F.min((F.col("a") + F.col("i") * F.col("b")) % F.lit(1 << 60))
            .cast("long")
            .alias("mv")
        ),
        eager=False,
    )  # both sides of the pair join read it
    a = sigs.alias("a")
    b = sigs.alias("b")
    match = F.sum(
        F.when(F.col("a.mv") == F.col("b.mv"), 1).otherwise(0)
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(match.alias("n_matching"))
        .select(
            "source_a",
            "source_b",
            "n_matching",
            (F.col("n_matching").cast("double") / float(_SRC_MH_K)).alias(
                "jaccard_est"
            ),
        )
    )
