"""Round-8 continuation batch 17: gate fairness and exploration
allocation — a demographic-parity audit of the Gopher quality gate
across languages and sources (Feldman et al. 2015's four-fifths-rule
framing: a "neutral" length/word-shape filter can silently strip a
language from the corpus — the fairness lens none of the quality
queries apply to themselves), and UCB1 source allocation (Auer,
Cesa-Bianchi & Fischer 2002: treat sources as bandit arms whose reward
is the gate pass-rate; the exploration bonus says which under-sampled
source to crawl NEXT, which the pure exploitation ranking of
beta_binomial_shrinkage cannot).

Engine-exactness: gate decisions replicate gopher_quality_rules'
exact rule stack (integer/4dp-rounded thresholds on exact counts);
parity ratios and UCB scores are ratios/logs of exact integers rounded
once at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table
from .gates import gopher_keep_bool_sql, gopher_keep_expr

# Gate thresholds live in gates.py (shared with gopher_quality_rules and
# cramers_v_matrix) so the audits can never desync from the gate they audit.
_GATE_SQL = f"""
        SELECT doc_id, lang, source,
               CASE WHEN {gopher_keep_bool_sql("w")} THEN 1 ELSE 0 END AS keep
        FROM (SELECT doc_id, lang, source,
                     string_split(lower(text), ' ') AS w
              FROM documents)
"""


def _gate(docs: DataFrame) -> DataFrame:
    """The gopher_quality_rules keep flag (one shared threshold set —
    gates.py) with the grouping columns carried along."""
    return docs.select(
        "doc_id", "lang", "source", gopher_keep_expr("text").alias("keep")
    )


# ---------------------------------------------------------------------------
# Demographic-parity audit of the quality gate (Feldman et al. 2015)
# ---------------------------------------------------------------------------


def _fairness_oracle() -> str:
    return f"""
    WITH gated AS ({_GATE_SQL}),
    groups AS (
        SELECT 'lang' AS group_type, lang AS grp,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(keep) AS BIGINT) AS n_kept
        FROM gated GROUP BY 2
        UNION ALL
        SELECT 'source', source, CAST(count(*) AS BIGINT),
               CAST(sum(keep) AS BIGINT)
        FROM gated GROUP BY 2
    ),
    best AS (
        SELECT group_type, max(CAST(n_kept AS DOUBLE) / n_docs) AS max_rate
        FROM groups GROUP BY 1
    )
    SELECT g.group_type, g.grp, g.n_docs, g.n_kept,
           round(CAST(g.n_kept AS DOUBLE) / g.n_docs, 4) AS sel_rate,
           round(CAST(g.n_kept AS DOUBLE) / g.n_docs / b.max_rate, 4)
               AS dp_ratio,
           CAST(CASE WHEN CAST(g.n_kept AS DOUBLE) / g.n_docs / b.max_rate
                          < 0.8 THEN 1 ELSE 0 END AS INT)
               AS fails_four_fifths
    FROM groups g JOIN best b USING (group_type)
    """


@register("fairness_gate_parity", _fairness_oracle(), tags=("X-fairness",))
def fairness_gate_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demographic-parity audit (Feldman et al. 2015 disparate-impact
    framing) of the Gopher quality gate across languages AND sources:
    per group the gate's selection rate, its ratio to the
    best-treated group, and the four-fifths-rule flag (dp_ratio < 0.8
    = the group loses documents at a legally-salient disparity). The
    lens the quality family never points at itself: a "neutral"
    word-length window tuned on English silently strips zh-style short
    tokens, and this query is where that shows up BEFORE the mixture
    queries (temperature/raking/doremi) bake the skew in.

    Gate decisions replicate gopher_quality_rules' exact rule stack;
    rates are ratios of exact counts, rounded once. Distributed shape:
    one narrow HOF projection (no explode), two group rollups, a
    2-row per-group-type max broadcast join."""
    docs = table(spark, sf_dir, "documents")
    gated = truncate_lineage(_gate(docs), eager=False)  # both rollups read it
    lang_g = gated.groupBy(F.col("lang").alias("grp")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("keep").cast("long").alias("n_kept"),
    ).select(F.lit("lang").alias("group_type"), "grp", "n_docs", "n_kept")
    src_g = gated.groupBy(F.col("source").alias("grp")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("keep").cast("long").alias("n_kept"),
    ).select(F.lit("source").alias("group_type"), "grp", "n_docs", "n_kept")
    groups = truncate_lineage(lang_g.unionByName(src_g), eager=False)
    rate = F.col("n_kept").cast("double") / F.col("n_docs")
    best = groups.groupBy("group_type").agg(F.max(rate).alias("max_rate"))
    return groups.join(F.broadcast(best), "group_type").select(
        "group_type",
        "grp",
        "n_docs",
        "n_kept",
        F.round(rate, 4).alias("sel_rate"),
        F.round(rate / F.col("max_rate"), 4).alias("dp_ratio"),
        (rate / F.col("max_rate") < 0.8).cast("int").alias("fails_four_fifths"),
    )


# ---------------------------------------------------------------------------
# UCB1 source allocation (Auer, Cesa-Bianchi & Fischer 2002)
# ---------------------------------------------------------------------------


def _ucb_oracle() -> str:
    return f"""
    WITH gated AS ({_GATE_SQL}),
    arms AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_pulls,
               CAST(sum(keep) AS BIGINT) AS n_reward
        FROM gated GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_pulls) AS BIGINT) AS big_n FROM arms)
    SELECT a.source, a.n_pulls, a.n_reward,
           round(CAST(a.n_reward AS DOUBLE) / a.n_pulls, 4) AS mean_reward,
           round(sqrt(2.0 * ln(CAST(t.big_n AS DOUBLE)) / a.n_pulls), 4)
               AS bonus,
           round(CAST(a.n_reward AS DOUBLE) / a.n_pulls
                 + sqrt(2.0 * ln(CAST(t.big_n AS DOUBLE)) / a.n_pulls), 4)
               AS ucb,
           CAST(row_number() OVER (
               ORDER BY round(CAST(a.n_reward AS DOUBLE) / a.n_pulls
                        + sqrt(2.0 * ln(CAST(t.big_n AS DOUBLE)) / a.n_pulls),
                        4) DESC, a.source) AS BIGINT) AS rank
    FROM arms a CROSS JOIN tot t
    """


@register("ucb_source_allocation", _ucb_oracle(), tags=("X-ucb",))
def ucb_source_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 source allocation (Auer, Cesa-Bianchi & Fischer 2002):
    sources are bandit arms, each document a pull, the Gopher gate's
    keep flag the reward; ucb = mean + sqrt(2 ln N / n) ranks which
    source the NEXT crawl budget should go to — exploration the pure
    exploitation rankings cannot express (beta_binomial_shrinkage
    shrinks small-sample means but still ranks by them; UCB's bonus
    makes a thin promising source outrank a fat mediocre one exactly
    until it is explored). The allocation member of the curation
    family: mixtures reweight what exists, UCB decides what to fetch.

    Counts are exact; the ranking orders by the 4dp-ROUNDED ucb with a
    source tiebreak (the rounded-rank discipline) so double ulp cannot
    flip positions between engines. Distributed shape: one narrow gate
    projection, a source-grain rollup, one scalar broadcast."""
    docs = table(spark, sf_dir, "documents")
    arms = _gate(docs).groupBy("source").agg(
        F.count("*").cast("long").alias("n_pulls"),
        F.sum("keep").cast("long").alias("n_reward"),
    )
    arms = truncate_lineage(arms, eager=False)  # totals + output read it
    tot = arms.agg(F.sum("n_pulls").cast("long").alias("big_n"))
    mean_r = F.col("n_reward").cast("double") / F.col("n_pulls")
    bonus = F.sqrt(2.0 * F.log(F.col("big_n").cast("double")) / F.col("n_pulls"))
    ucb4 = F.round(mean_r + bonus, 4)
    return (
        arms.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(Window.orderBy(F.desc(ucb4), "source")).cast("long"))
        .select(
            "source",
            "n_pulls",
            "n_reward",
            F.round(mean_r, 4).alias("mean_reward"),
            F.round(bonus, 4).alias("bonus"),
            ucb4.alias("ucb"),
            "rank",
        )
    )
