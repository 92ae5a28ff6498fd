"""Round-8 continuation batch 21: categorical association profiling and
iterative outlier extraction — the pairwise Cramér's V matrix over the
corpus's categorical facets (Cramér 1946: the normalized effect size
chi2_lang_source only computes for one pair and never normalizes — a
profiling pass reads THIS matrix to find which facets are entangled
before trusting any per-facet statistic), and three unrolled rounds of
the generalized-ESD outlier procedure (Rosner 1983: repeatedly extract
the most extreme day and RECOMPUTE the moments without it — the
masking-proof outlier test; zscore_outliers' single pass lets one huge
spike inflate sigma and hide the second spike).

Engine-exactness: every contingency cell and margin is an exact
integer; chi2/V round once per pair. ESD moments update in CLOSED FORM
(subtract the removed value from the exact sums — no re-scan), and
each extraction picks by the 6dp-rounded statistic with a day
tiebreak, so both engines remove identical days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table
from .gates import gopher_keep_bool_sql, gopher_keep_expr

# ---------------------------------------------------------------------------
# Pairwise Cramér's V association matrix (Cramér 1946)
# ---------------------------------------------------------------------------

# categorical facets: lang, source, a coarse length bucket, the gopher keep
# flag — threshold set shared via gates.py so this facet can never desync
# from gopher_quality_rules.
_CV_GATE = f"""
           CASE WHEN {gopher_keep_bool_sql("w")}
                THEN 'keep' ELSE 'drop' END
"""


def _cv_oracle() -> str:
    pair_rows = """
        SELECT 'lang|source' AS pair, lang AS a, source AS b FROM facets
        UNION ALL SELECT 'lang|len_bucket', lang, len_bucket FROM facets
        UNION ALL SELECT 'lang|keep', lang, keep FROM facets
        UNION ALL SELECT 'source|len_bucket', source, len_bucket FROM facets
        UNION ALL SELECT 'source|keep', source, keep FROM facets
        UNION ALL SELECT 'len_bucket|keep', len_bucket, keep FROM facets
    """
    return f"""
    WITH facets AS (
        SELECT lang, source,
               CAST(n_chars // 100 AS VARCHAR) AS len_bucket,
               {_CV_GATE} AS keep
        FROM (SELECT lang, source, n_chars,
                     string_split(lower(text), ' ') AS w
              FROM documents)
    ),
    melted AS ({pair_rows}),
    cells AS (
        SELECT pair, a, b, CAST(count(*) AS BIGINT) AS o
        FROM melted GROUP BY 1, 2, 3
    ),
    ra AS (SELECT pair, a, CAST(sum(o) AS BIGINT) AS ma FROM cells GROUP BY 1, 2),
    rb AS (SELECT pair, b, CAST(sum(o) AS BIGINT) AS mb FROM cells GROUP BY 1, 2),
    nn AS (SELECT pair, CAST(sum(o) AS BIGINT) AS n FROM cells GROUP BY 1),
    dims AS (
        SELECT pair, CAST(count(DISTINCT a) AS BIGINT) AS r,
               CAST(count(DISTINCT b) AS BIGINT) AS c
        FROM melted GROUP BY 1
    ),
    chi AS (  -- sum over OBSERVED cells plus the zero-cell correction:
              -- sum_cells (o-e)^2/e = sum o^2/e - n  (algebraic identity,
              -- so absent cells need no grid fill)
        SELECT c.pair,
               sum(CAST(c.o AS DOUBLE) * c.o * n.n
                   / (CAST(a.ma AS DOUBLE) * b.mb)) - max(n.n) AS chi2
        FROM cells c
        JOIN ra a USING (pair, a) JOIN rb b USING (pair, b)
        JOIN nn n USING (pair)
        GROUP BY 1
    )
    SELECT d.pair, d.r AS n_rows, d.c AS n_cols, n.n,
           round(h.chi2, 4) AS chi2,
           round(sqrt(h.chi2 / (n.n * (least(d.r, d.c) - 1))), 4) AS cramers_v
    FROM dims d JOIN nn n USING (pair) JOIN chi h USING (pair)
    """


@register("cramers_v_matrix", _cv_oracle(), tags=("X-cramers-v",))
def cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Cramér's V (Cramér 1946) over the corpus's four
    categorical facets — language, source, a 100-char length bucket,
    and the Gopher keep/drop gate: the normalized association matrix a
    profiling pass reads FIRST (chi2_lang_source tests one pair and its
    chi2 grows with n; V in [0,1] is comparable across pairs), because
    every per-facet statistic downstream silently assumes the facets
    are not entangled — a high lang|keep V is exactly the
    fairness_gate_parity finding restated as an effect size.

    Chi-square uses the identity sum (o-e)^2/e = n * (sum o^2/(ma mb)
    / ... ) - n over OBSERVED cells only, so no r x c grid fill-in is
    needed and every margin is an exact integer; V rounds once per
    pair. Distributed shape: one narrow facet projection fanned into 6
    (pair, a, b) rows per document (constant fan-out), one cell
    aggregation, margin/dimension rollups on cell-grain frames."""
    docs = table(spark, sf_dir, "documents")
    keep = F.when(gopher_keep_expr("text") == 1, "keep").otherwise("drop")
    facets = docs.select(
        "lang",
        "source",
        F.floor(F.col("n_chars") / 100).cast("long").cast("string").alias(
            "len_bucket"
        ),
        keep.alias("keep"),
    )
    pairs_arr = F.array(
        *[
            F.struct(F.lit(p).alias("pair"), F.col(x).alias("a"), F.col(y).alias("b"))
            for p, x, y in (
                ("lang|source", "lang", "source"),
                ("lang|len_bucket", "lang", "len_bucket"),
                ("lang|keep", "lang", "keep"),
                ("source|len_bucket", "source", "len_bucket"),
                ("source|keep", "source", "keep"),
                ("len_bucket|keep", "len_bucket", "keep"),
            )
        ]
    )
    melted = truncate_lineage(
        facets.select(F.explode(pairs_arr).alias("e")).select(
            "e.pair", "e.a", "e.b"
        ),
        eager=False,
    )  # cells + dims read it
    cells = truncate_lineage(
        melted.groupBy("pair", "a", "b").agg(F.count("*").cast("long").alias("o")),
        eager=False,
    )  # margins, totals, and the chi2 join read it
    ra = cells.groupBy("pair", "a").agg(F.sum("o").cast("long").alias("ma"))
    rb = cells.groupBy("pair", "b").agg(F.sum("o").cast("long").alias("mb"))
    nn = cells.groupBy("pair").agg(F.sum("o").cast("long").alias("n"))
    dims = melted.groupBy("pair").agg(
        F.count_distinct("a").cast("long").alias("r"),
        F.count_distinct("b").cast("long").alias("c"),
    )
    chi = (
        cells.join(ra, ["pair", "a"])
        .join(rb, ["pair", "b"])
        .join(F.broadcast(nn), "pair")
        .groupBy("pair")
        .agg(
            (
                F.sum(
                    F.col("o").cast("double")
                    * F.col("o")
                    * F.col("n")
                    / (F.col("ma").cast("double") * F.col("mb"))
                )
                - F.max("n")
            ).alias("chi2")
        )
    )
    return (
        dims.join(F.broadcast(nn), "pair")
        .join(F.broadcast(chi), "pair")
        .select(
            "pair",
            F.col("r").alias("n_rows"),
            F.col("c").alias("n_cols"),
            "n",
            F.round(F.col("chi2"), 4).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2") / (F.col("n") * (F.least("r", "c") - 1))
                ),
                4,
            ).alias("cramers_v"),
        )
    )


# ---------------------------------------------------------------------------
# Generalized-ESD outlier extraction, 3 unrolled rounds (Rosner 1983)
# ---------------------------------------------------------------------------

_ESD_ROUNDS = 3


def _esd_oracle() -> str:
    # each round: compute the max |x - mean|/sd over the REMAINING days
    # (picked by rounded stat + day tiebreak), then update the exact
    # sums in closed form
    blocks = ["""
    daily AS (
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(yc AS BIGINT) AS yc
        FROM (SELECT CAST(ts AS DATE) AS day,
                     CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                         AS yc
              FROM events GROUP BY 1)
    ),
    s0 AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(yc) AS BIGINT) AS s,
               CAST(sum(CAST(yc AS HUGEINT) * yc) AS HUGEINT) AS ss
        FROM daily
    )"""]
    prev_excl = ""
    for r in range(1, _ESD_ROUNDS + 1):
        excl = " AND ".join(
            f"d.day <> (SELECT day FROM p{i})" for i in range(1, r)
        )
        where = f"WHERE {excl}" if excl else ""
        blocks.append(f"""
    p{r} AS (
        SELECT d.day, d.yc,
               round(abs(d.yc - CAST(s.s AS DOUBLE) / s.n)
                     / sqrt((CAST(s.ss AS DOUBLE)
                             - CAST(s.s AS DOUBLE) * s.s / s.n)
                            / (s.n - 1)), 6) AS r_stat,
               s.n AS n_before
        FROM daily d CROSS JOIN s{r - 1} s
        {where}
        ORDER BY round(abs(d.yc - CAST(s.s AS DOUBLE) / s.n)
                     / sqrt((CAST(s.ss AS DOUBLE)
                             - CAST(s.s AS DOUBLE) * s.s / s.n)
                            / (s.n - 1)), 6) DESC, d.day
        LIMIT 1
    ),
    s{r} AS (
        SELECT s.n - 1 AS n, CAST(s.s - p.yc AS BIGINT) AS s,
               CAST(s.ss - CAST(p.yc AS HUGEINT) * p.yc AS HUGEINT) AS ss
        FROM s{r - 1} s CROSS JOIN p{r} p
    )""")
        prev_excl = excl
    selects = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({r} AS INTEGER) AS round, day,
           round(yc / 100.0, 2) AS value, r_stat,
           CAST(n_before AS BIGINT) AS n_at_test
    FROM p{r}"""
        for r in range(1, _ESD_ROUNDS + 1)
    )
    return "WITH " + ",".join(blocks) + "\n" + selects


@register("esd_outlier_rounds", _esd_oracle(), tags=("X-esd",))
def esd_outlier_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three unrolled rounds of the generalized-ESD outlier procedure
    (Rosner 1983) on daily revenue: each round extracts the day with
    the largest |x - mean|/sd over the REMAINING days, then removes it
    and recomputes the moments — the masking-proof refinement of
    zscore_outliers (one huge spike inflates sigma enough to hide the
    second; recomputation un-hides it) and the statistical twin of the
    matrix profile's model-free discord. r_stat per round is what
    Rosner's lambda critical values would be compared against.

    The moment updates are CLOSED FORM on exact integer sums (subtract
    the removed value — no re-scan of the series), and every extraction
    picks by the 6dp-rounded statistic with a day tiebreak, so both
    engines remove identical days in identical order. Distributed
    shape: one day-grain aggregation, then three scalar-broadcast
    passes over the calendar-bounded day frame with single-row
    TakeOrdered picks."""
    ev = table(spark, sf_dir, "events")
    daily = truncate_lineage(
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("yc")
        )
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "yc"),
        eager=False,
    )  # all three rounds scan it
    stats = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("yc").cast("long").alias("s"),
        F.sum(F.col("yc").cast("decimal(38,0)") * F.col("yc")).alias("ss"),
    )
    picks = []
    excluded: list = []
    cur = stats
    for rnd in range(1, _ESD_ROUNDS + 1):
        mean = F.col("s").cast("double") / F.col("n")
        sd = F.sqrt(
            (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
        )
        frame = daily.crossJoin(F.broadcast(cur))
        for ex in excluded:
            frame = frame.join(
                F.broadcast(ex.select(F.col("day").alias("xday"))),
                F.col("day") == F.col("xday"),
                "left_anti",
            )
        pick = (
            frame.select(
                "day",
                "yc",
                F.round(F.abs(F.col("yc") - mean) / sd, 6).alias("r_stat"),
                F.col("n").alias("n_before"),
                F.col("s"),
                F.col("ss"),
            )
            .orderBy(F.desc("r_stat"), "day")
            .limit(1)
        )
        pick = truncate_lineage(pick, eager=False)  # output + next stats read it
        picks.append(
            pick.select(
                F.lit(rnd).cast("int").alias("round"),
                "day",
                F.round(F.col("yc") / 100.0, 2).alias("value"),
                "r_stat",
                F.col("n_before").cast("long").alias("n_at_test"),
            )
        )
        cur = pick.select(
            (F.col("n_before") - 1).cast("long").alias("n"),
            (F.col("s") - F.col("yc")).cast("long").alias("s"),
            (F.col("ss") - F.col("yc").cast("decimal(38,0)") * F.col("yc"))
            .cast("decimal(38,0)")
            .alias("ss"),
        )
        excluded.append(pick)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out
