"""Round-6 additions: governance, drift/changepoint, pipeline-quality
evaluation, and statistics operators a training-data platform runs on
top of the round-1..5 surface.

Every query follows the catalog determinism rules (catalog.py module
docstring): identical aliases both engines, decimal-exact aggregation
wherever a double sum would be partition-order-dependent, explicit
tiebreaks on every ranking, rounding at the edge only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import portable_hash64_sql
from ..operators.fanout import fan_out
from .catalog import register, table

# ---------------------------------------------------------------------------
# k-anonymity audit — training-data governance over quasi-identifiers
# ---------------------------------------------------------------------------


@register(
    "k_anonymity_audit",
    """
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS k_size
        FROM customer GROUP BY 1, 2
    )
    SELECT k_size,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(k_size) AS BIGINT) AS n_rows
    FROM classes GROUP BY 1
    """,
    tags=("X-k-anonymity",),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity profile over the quasi-identifier pair
    (nation, market segment): for every equivalence-class size k, how
    many classes and rows sit at that size — the histogram a governance
    gate reads to decide whether a release violates a k>=K policy
    (classes at k=1 are directly re-identifiable rows).

    Scale shape: one keyed aggregation over the table, then a re-agg of
    the already-reduced class frame (metadata-scale) — the same
    two-level reduction as partition_zonemap_stats. No windows, no
    joins."""
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("k_size")
    )
    return classes.groupBy("k_size").agg(
        F.count("*").alias("n_classes"),
        F.sum("k_size").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint — where did a daily series shift?
# ---------------------------------------------------------------------------


@register(
    "cusum_changepoint",
    """
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, CAST(sum(n) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    ),
    cusum AS (
        SELECT d.event_type, d.day,
               CAST(sum(d.n) OVER (PARTITION BY d.event_type ORDER BY d.day
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               row_number() OVER (PARTITION BY d.event_type ORDER BY d.day)
                   AS rn,
               CAST(s.total AS DOUBLE) / s.n_days AS mean_n
        FROM daily d JOIN stats s ON d.event_type = s.event_type
    ),
    dev AS (
        SELECT event_type, day,
               abs(CAST(cum AS DOUBLE) - rn * mean_n) AS adev,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY abs(CAST(cum AS DOUBLE) - rn * mean_n) DESC, day
               ) AS pick
        FROM cusum
    )
    SELECT event_type, day AS change_day, round(adev, 4) AS max_cusum
    FROM dev WHERE pick = 1
    """,
    tags=("X-cusum",),
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event type: the day where the cumulative
    deviation of daily volume from its flat baseline peaks — the
    standard first look when a drift monitor fires ("WHEN did the mix
    shift", after psi_drift_report says "it shifted").

    Determinism: cumulative sums run over exact integers; the only float
    is the final cum − i·mean, computed identically per row on both
    engines, with the argmax tie-broken by day. Scale shape: the raw
    scan reduces to (type, day) grain FIRST, so the windows run over
    days-sized partitions — bounded regardless of event volume."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.sum("n").alias("total"), F.count("*").alias("n_days")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rn = Window.partitionBy("event_type").orderBy("day")
    cusum = (
        daily.join(stats, "event_type")
        .select(
            "event_type",
            "day",
            F.sum("n").over(w_cum).alias("cum"),
            F.row_number().over(w_rn).alias("rn"),
            (F.col("total").cast("double") / F.col("n_days")).alias("mean_n"),
        )
    )
    adev = F.abs(F.col("cum").cast("double") - F.col("rn") * F.col("mean_n"))
    w_pick = Window.partitionBy("event_type").orderBy(adev.desc(), "day")
    return (
        cusum.withColumn("adev", adev)
        .withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.round("adev", 4).alias("max_cusum"),
        )
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution — power iteration, decimal-exact
# ---------------------------------------------------------------------------

_MARKOV_ITERS = 5

_MARKOV_STEPS = ",\n".join(
    f"""
    x{i + 1} AS (
        SELECT t.next_state AS state,
               CAST(sum(CAST(x.p * t.prob AS DECIMAL(30, 18))) AS DOUBLE) AS p
        FROM x{i} x JOIN t ON x.state = t.prev_state
        GROUP BY 1
    )"""
    for i in range(_MARKOV_ITERS)
)


@register(
    "markov_stationary_power",
    f"""
    WITH seq AS (
        SELECT event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    c AS (
        SELECT prev_type AS prev_state, event_type AS next_state,
               count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    t AS (
        SELECT prev_state, next_state,
               n / CAST(sum(n) OVER (PARTITION BY prev_state) AS DOUBLE)
                   AS prob
        FROM c
    ),
    states AS (SELECT DISTINCT prev_state AS state FROM t),
    x0 AS (
        SELECT state, 1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM states) AS p
        FROM states
    ),
    {_MARKOV_STEPS}
    SELECT state, round(p, 8) AS stationary_p FROM x{_MARKOV_ITERS}
    """,
    tags=("X-markov-stationary",),
)
def markov_stationary_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain by
    5 power-iteration steps from uniform — the "where does
    a user end up" summary on top of event_transition_matrix.

    The iteration is relational: x_{t+1}(s') = Σ_s x_t(s)·P(s,s') is a
    join + keyed sum over the |states|² transition frame (metadata-scale
    after the one sequence shuffle), repeated as 5 plan
    stages — the same finite-unroll pattern as ivf_kmeans_cells, and the
    oracle unrolls the identical CTE blocks. Each step's products are
    computed in double (deterministic per row) and summed in
    DECIMAL(30,18), so every iterate is bit-reproducible across
    partitionings and engines."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy(
        F.col("prev_type").alias("prev_state"),
        F.col("event_type").alias("next_state"),
    ).agg(F.count("*").alias("n"))
    t = c.select(
        "prev_state",
        "next_state",
        (
            F.col("n")
            / F.sum("n").over(Window.partitionBy("prev_state")).cast("double")
        ).alias("prob"),
    )
    states = t.select(F.col("prev_state").alias("state")).distinct()
    k = states.agg(F.count("*").cast("double").alias("k"))
    x = states.join(F.broadcast(k)).select(
        "state", (F.lit(1.0) / F.col("k")).alias("p")
    )
    for _ in range(_MARKOV_ITERS):
        x = (
            x.join(t, x.state == t.prev_state)
            .groupBy(F.col("next_state").alias("state"))
            .agg(
                F.sum((F.col("p") * F.col("prob")).cast("decimal(30,18)"))
                .cast("double")
                .alias("p")
            )
        )
    return x.select("state", F.round("p", 8).alias("stationary_p"))


# ---------------------------------------------------------------------------
# LSH tuning report — recall/precision of the banding scheme vs exact truth
# ---------------------------------------------------------------------------

_LSH_EVAL_T = "0.5"  # rational 1/2 so both paths use exact integer prefixes


@register(
    "lsh_tuning_report",
    """
    WITH docs_w AS (
        SELECT doc_id, text, string_split(lower(text), ' ') AS w FROM documents
    ),
    shingled AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(w) >= 3
                        THEN list_transform(generate_series(1, len(w) - 2),
                                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                        ELSE [lower(text)] END
               ) AS sh
        FROM docs_w
    ),
    truth AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
              >= 0.5
    ),
    sigs AS (
        SELECT doc_id,
               list_min(list_transform(hs, h -> ('0x' || substr(h, 1, 15))::BIGINT
                   % 1152921504606846976)) AS sig0,
               list_min(list_transform(hs, h -> (('0x' || substr(h, 1, 15))::BIGINT
                   + 1 * ('0x' || substr(h, 17, 15))::BIGINT)
                   % 1152921504606846976)) AS sig1,
               list_min(list_transform(hs, h -> (('0x' || substr(h, 1, 15))::BIGINT
                   + 2 * ('0x' || substr(h, 17, 15))::BIGINT)
                   % 1152921504606846976)) AS sig2,
               list_min(list_transform(hs, h -> (('0x' || substr(h, 1, 15))::BIGINT
                   + 3 * ('0x' || substr(h, 17, 15))::BIGINT)
                   % 1152921504606846976)) AS sig3
        FROM (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM shingled)
    ),
    bands AS (
        SELECT doc_id, 0 AS band, md5(sig0 || ':' || sig1) AS band_hash FROM sigs
        UNION ALL
        SELECT doc_id, 1 AS band, md5(sig2 || ':' || sig3) AS band_hash FROM sigs
    ),
    pred AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
    ),
    hit AS (SELECT * FROM pred INTERSECT SELECT * FROM truth)
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT count(*) FROM pred) AS BIGINT) AS n_pred,
           CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
           round((SELECT count(*) FROM hit)
                 / CAST((SELECT count(*) FROM truth) AS DOUBLE), 4) AS recall,
           round((SELECT count(*) FROM hit)
                 / CAST((SELECT count(*) FROM pred) AS DOUBLE), 4) AS precision
    """,
    tags=("X-lsh-tuning",),
)
def lsh_tuning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluates the dedup pipeline's OWN banding scheme: recall and
    precision of the (k=4, 2-rows-per-band) MinHash-LSH candidates
    against exact-Jaccard >= 0.5 ground truth. The number a platform
    team actually tunes b and r against — LSH recall is probabilistic,
    so shipping a banding config without this report is guesswork.

    Ground truth comes from the LOSSLESS prefix-filter join (threshold
    as the rational 1/2, exact integer prefix lengths), not a quadratic
    scan — so even the truth side is the 100 TB plan. Candidates and
    truth then reduce to three one-row counts joined broadcast; nothing
    row-scale leaves the executors. The oracle's truth side IS the
    brute-force all-pairs scan, so a green row simultaneously re-proves
    prefix-filter losslessness at this threshold."""
    from ..functions.lineage import truncate_lineage
    from ..operators.dedup import (
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
        prefix_filter_jaccard_pairs,
        shingle_frame,
    )

    # ONE checkpointed shingle frame feeds the truth side's posting
    # lists + verify join AND the minhash build; the band frame is
    # checkpointed too so the candidate self-join doesn't evaluate the
    # interpreted minhash transforms on both aliases (the same sharing
    # the standalone LSH queries adopted this round).
    docs = table(spark, sf_dir, "documents")
    sh = truncate_lineage(shingle_frame(docs), eager=False)
    bands = truncate_lineage(
        lsh_bands(minhash_signatures(docs, 4, shingles=sh), rows_per_band=2),
        eager=False,
    )
    truth = prefix_filter_jaccard_pairs(
        docs, t_num=1, t_den=2, shingles=sh
    ).select("id_a", "id_b")
    pred = lsh_candidate_pairs(docs, k=4, rows_per_band=2, bands=bands).select(
        F.col("doc_id_a").alias("id_a"), F.col("doc_id_b").alias("id_b")
    )
    hit = pred.join(truth, ["id_a", "id_b"], "left_semi")
    nt = truth.agg(F.count("*").alias("n_true"))
    np_ = pred.agg(F.count("*").alias("n_pred"))
    nh = hit.agg(F.count("*").alias("n_hit"))
    return (
        nt.join(F.broadcast(np_))
        .join(F.broadcast(nh))
        .select(
            "n_true",
            "n_pred",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_true").cast("double"), 4).alias(
                "recall"
            ),
            F.round(F.col("n_hit") / F.col("n_pred").cast("double"), 4).alias(
                "precision"
            ),
        )
    )


# ---------------------------------------------------------------------------
# One-way ANOVA — does value differ across event types?
# ---------------------------------------------------------------------------


@register(
    "anova_f_by_group",
    """
    WITH s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(value AS DECIMAL(30, 10))) AS sv,
               sum(CAST(value * value AS DECIMAL(30, 10))) AS sq
        FROM events GROUP BY 1
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS n_tot,
               CAST(sum(sv) AS DOUBLE) / sum(n) AS grand_mean
        FROM s
    ),
    terms AS (
        SELECT g.k, g.n_tot,
               sum(CAST(s.n * pow(CAST(s.sv AS DOUBLE) / s.n - g.grand_mean, 2)
                        AS DECIMAL(30, 10))) AS ssb,
               sum(CAST(CAST(s.sq AS DOUBLE)
                        - CAST(s.sv AS DOUBLE) * CAST(s.sv AS DOUBLE) / s.n
                        AS DECIMAL(30, 10))) AS ssw
        FROM s, g GROUP BY 1, 2
    )
    SELECT k, n_tot,
           round(CAST(ssb AS DOUBLE), 4) AS ss_between,
           round(CAST(ssw AS DOUBLE), 4) AS ss_within,
           round((CAST(ssb AS DOUBLE) / (k - 1))
                 / (CAST(ssw AS DOUBLE) / (n_tot - k)), 6) AS f_stat
    FROM terms
    """,
    tags=("X-anova",),
)
def anova_f_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic for value across event types — the
    k-group generalization of ab_test_welch_t, from the same decimal
    sufficient statistics (n, Σv, Σv²) per group.

    Scale shape: ONE map-side-combined aggregation over events; the
    group frame is |types| rows, so the between/within sums are
    metadata-scale. Per-group doubles derive from exact decimals
    identically on both engines; the second-level sums go back through
    DECIMAL(30,10) so k-group addition order can't move the output."""
    ev = table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(30,10)")).alias("sv"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,10)")).alias(
            "sq"
        ),
    )
    g = s.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n_tot"),
        (F.sum("sv").cast("double") / F.sum("n")).alias("grand_mean"),
    )
    mean_g = F.col("sv").cast("double") / F.col("n")
    ssb_term = (
        F.col("n") * F.pow(mean_g - F.col("grand_mean"), F.lit(2))
    ).cast("decimal(30,10)")
    ssw_term = (
        F.col("sq").cast("double")
        - F.col("sv").cast("double") * F.col("sv").cast("double") / F.col("n")
    ).cast("decimal(30,10)")
    terms = (
        s.join(F.broadcast(g))
        .groupBy("k", "n_tot")
        .agg(F.sum(ssb_term).alias("ssb"), F.sum(ssw_term).alias("ssw"))
    )
    ssb_d, ssw_d = F.col("ssb").cast("double"), F.col("ssw").cast("double")
    return terms.select(
        "k",
        "n_tot",
        F.round(ssb_d, 4).alias("ss_between"),
        F.round(ssw_d, 4).alias("ss_within"),
        F.round(
            (ssb_d / (F.col("k") - 1)) / (ssw_d / (F.col("n_tot") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Chi-square association — is lang independent of source?
# ---------------------------------------------------------------------------


@register(
    "chi2_lang_source",
    """
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        FROM documents GROUP BY 1, 2
    ),
    rows_t AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
    cols_t AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    grid AS (
        SELECT r.lang, c.source, r.rt, c.ct, n.n,
               coalesce(cl.o, 0) AS o,
               CAST(r.rt AS DOUBLE) * c.ct / n.n AS e
        FROM rows_t r CROSS JOIN cols_t c CROSS JOIN n
        LEFT JOIN cells cl ON cl.lang = r.lang AND cl.source = c.source
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((SELECT count(*) - 1 FROM rows_t)
                * (SELECT count(*) - 1 FROM cols_t) AS BIGINT) AS dof,
           round(CAST(sum(CAST(pow(o - e, 2) / e AS DECIMAL(30, 12)))
                      AS DOUBLE), 6) AS chi2
    FROM grid
    """,
    tags=("X-chi2",),
)
def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between lang and source —
    the categorical-association check a corpus monitor runs to catch a
    crawler suddenly feeding one language from one source.

    The contingency table INCLUDES empty cells (absent (lang, source)
    combos contribute their full expected count), built as a cross join
    of the two marginal frames — both metadata-scale after the one cell
    aggregation, so the cross join is langs x sources rows, never data.
    Cell terms are doubles derived identically from exact integers; the
    final sum goes through DECIMAL(30,12)."""
    docs = table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    rows_t = cells.groupBy("lang").agg(F.sum("o").alias("rt"))
    cols_t = cells.groupBy("source").agg(F.sum("o").alias("ct"))
    n = cells.agg(F.sum("o").alias("n"))
    dof = (
        rows_t.agg(F.count("*").alias("nr"))
        .join(F.broadcast(cols_t.agg(F.count("*").alias("nc"))))
        .select(((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"))
    )
    grid = (
        rows_t.join(F.broadcast(cols_t))
        .join(F.broadcast(n))
        .join(cells, ["lang", "source"], "left")
        .select(
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            (F.col("rt").cast("double") * F.col("ct") / F.col("n")).alias("e"),
        )
    )
    term = (F.pow(F.col("o") - F.col("e"), F.lit(2)) / F.col("e")).cast(
        "decimal(30,12)"
    )
    agg = grid.agg(
        F.count("*").alias("n_cells"),
        F.round(F.sum(term).cast("double"), 6).alias("chi2"),
    )
    return agg.join(F.broadcast(dof)).select("n_cells", "dof", "chi2")


# ---------------------------------------------------------------------------
# Gini split scan — best decision-stump threshold, distributed
# ---------------------------------------------------------------------------

_GINI_BUCKET = 50


@register(
    "gini_split_scan",
    f"""
    WITH b AS (
        SELECT n_chars // {_GINI_BUCKET} AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS pos
        FROM documents GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(pos) AS BIGINT) AS pt
        FROM b
    ),
    cum AS (
        SELECT bucket,
               CAST(sum(n) OVER (ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
               CAST(sum(pos) OVER (ORDER BY bucket
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl
        FROM b
    ),
    scored AS (
        SELECT c.bucket, c.nl, t.nt - c.nl AS nr,
               (c.nl * (1.0 - pow(CAST(c.pl AS DOUBLE) / c.nl, 2)
                            - pow(CAST(c.nl - c.pl AS DOUBLE) / c.nl, 2))
                + (t.nt - c.nl)
                  * (1.0 - pow(CAST(t.pt - c.pl AS DOUBLE) / (t.nt - c.nl), 2)
                         - pow(CAST((t.nt - c.nl) - (t.pt - c.pl) AS DOUBLE)
                               / (t.nt - c.nl), 2))) / t.nt AS gini
        FROM cum c, tot t
        WHERE t.nt - c.nl > 0
    )
    SELECT bucket AS split_bucket,
           CAST((bucket + 1) * {_GINI_BUCKET} AS BIGINT) AS threshold_chars,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           round(gini, 6) AS gini
    FROM (SELECT *, row_number() OVER (ORDER BY gini, bucket) AS pick
          FROM scored)
    WHERE pick = 1
    """,
    tags=("X-gini-split",),
)
def gini_split_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best decision-stump split of doc length against the lang='en'
    label by weighted Gini impurity — the inner loop of distributed
    tree building (and a quick "is this feature predictive" probe),
    done the way a tree learner actually scales it: aggregate to
    bounded histogram buckets FIRST, then scan thresholds over the
    bucket frame.

    The unpartitioned cumulative window runs over the bucket histogram
    (<= max_chars/50 rows — metadata-scale by construction,
    same class as open_order_backlog_sweepline's day grid). All
    impurities are doubles derived identically from exact integer
    cumulative counts; argmin tie-breaks on bucket."""
    docs = table(spark, sf_dir, "documents")
    b = docs.groupBy(
        (F.col("n_chars") / F.lit(_GINI_BUCKET)).cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum((F.col("lang") == "en").cast("int")).alias("pos"),
    )
    tot = b.agg(F.sum("n").alias("nt"), F.sum("pos").alias("pt"))
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = b.select(
        "bucket",
        F.sum("n").over(w_cum).alias("nl"),
        F.sum("pos").over(w_cum).alias("pl"),
    )
    j = cum.join(F.broadcast(tot)).filter(F.col("nt") - F.col("nl") > 0)
    nl, pl = F.col("nl"), F.col("pl")
    nr = F.col("nt") - nl
    pr = F.col("pt") - pl
    gini_l = (
        F.lit(1.0)
        - F.pow(pl.cast("double") / nl, F.lit(2))
        - F.pow((nl - pl).cast("double") / nl, F.lit(2))
    )
    gini_r = (
        F.lit(1.0)
        - F.pow(pr.cast("double") / nr, F.lit(2))
        - F.pow((nr - pr).cast("double") / nr, F.lit(2))
    )
    gini = (nl * gini_l + nr * gini_r) / F.col("nt")
    scored = j.select("bucket", nl.alias("n_left"), nr.alias("n_right"), gini.alias("gini"))
    w_pick = Window.orderBy("gini", "bucket")
    return (
        scored.withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") == 1)
        .select(
            F.col("bucket").alias("split_bucket"),
            ((F.col("bucket") + 1) * _GINI_BUCKET).cast("long").alias(
                "threshold_chars"
            ),
            F.col("n_left").cast("long").alias("n_left"),
            F.col("n_right").cast("long").alias("n_right"),
            F.round("gini", 6).alias("gini"),
        )
    )


# ---------------------------------------------------------------------------
# Mutual k-NN pairs — reciprocal-neighbor dedup/link signal
# ---------------------------------------------------------------------------

_MKNN_K = 5

# the one centralized cosine oracle form (same expression six other
# queries use) — import, don't re-spell, so precision tweaks propagate
from .training import _cos_sql  # noqa: E402

_MKNN_COS = _cos_sql("a.embedding", "b.embedding")


@register(
    "mutual_knn_pairs",
    f"""
    WITH scored AS (
        SELECT a.label, a.vec_id AS src, b.vec_id AS dst,
               {_MKNN_COS} AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    knn AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY src
                                         ORDER BY cos_sim DESC, dst) AS rn
            FROM scored
        ) WHERE rn <= {_MKNN_K}
    )
    SELECT f.label, f.src AS id_a, f.dst AS id_b, f.cos_sim
    FROM knn f JOIN knn r ON f.src = r.dst AND f.dst = r.src
    WHERE f.src < f.dst
    """,
    tags=("X-mutual-knn",),
)
def mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal nearest neighbors: pairs where each vector is in the
    other's cosine top-5 — the high-precision link signal used
    for embedding-level dedup and cluster seeding (one-directional kNN
    is noisy near hub vectors; mutuality kills the hubs).

    Scale shape: the pair scan is CELL-RESTRICTED (label as the IVF
    cell, the ann_ivf_label_topk pattern) — quadratic only within a
    cell, an equi-join on the cell key across cells. Per-source top-k is
    a rank-bounded window partitioned by vector; the mutuality check is
    a self-equi-join of the k-bounded directed-edge frame on the
    reversed key, so it touches k·n rows, never the pair scan again."""
    from ..operators.similarity import _dot, _norm

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    # norms hoisted to per-VECTOR columns before the pair join (the
    # semdedup_prune pattern): the per-pair work drops from three
    # interpreted HOF folds (dot + both norms) to one — measured 6.7 ->
    # ~2.5 s at sf0.1 on the ~400k in-cell pairs, same rounded values.
    a = emb.select(
        "label",
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("emb_a"),
        _norm(F.col("embedding")).alias("norm_a"),
    )
    b = emb.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("emb_b"),
        _norm(F.col("embedding")).alias("norm_b"),
    )
    # Score each unordered pair ONCE and mirror: cosine is bit-commutative
    # here (zip_with multiplies elementwise in array order and the fold
    # order is identical both ways), so the src<dst half-join carries the
    # full information at half the interpreted-HOF cost. The half frame is
    # lazily checkpointed so the union's two branches consume the scored
    # rows as data instead of re-running the pair join per branch
    # (Catalyst does not dedupe aliased subplans).
    from ..functions.lineage import truncate_lineage

    half = truncate_lineage(
        a.join(b, (a.label == b.label_b) & (F.col("src") < F.col("dst")))
        .select(
            "label",
            "src",
            "dst",
            F.round(
                _dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("norm_a") * F.col("norm_b")),
                4,
            ).alias("cos_sim"),
        ),
        eager=False,
    )
    scored = half.unionByName(
        half.select(
            "label",
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            "cos_sim",
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), "dst")
    knn = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _MKNN_K
    )
    f = knn.select("label", "src", "dst", "cos_sim")
    r = knn.select(F.col("src").alias("dst"), F.col("dst").alias("src"))
    return (
        f.join(r, ["src", "dst"], "left_semi")
        .filter(F.col("src") < F.col("dst"))
        .select(
            "label",
            F.col("src").alias("id_a"),
            F.col("dst").alias("id_b"),
            "cos_sim",
        )
    )


# ---------------------------------------------------------------------------
# Duplication-discounted token budget per source
# ---------------------------------------------------------------------------


@register(
    "dup_discounted_tokens",
    """
    WITH w AS (
        SELECT source,
               len(string_split(lower(text), ' ')) AS toks,
               count(*) OVER (PARTITION BY md5(text)) AS c
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS raw_tokens,
           round(CAST(sum(CAST(toks / CAST(c AS DOUBLE) AS DECIMAL(30, 12)))
                      AS DOUBLE), 4) AS discounted_tokens
    FROM w GROUP BY 1
    """,
    tags=("X-dup-discount",),
)
def dup_discounted_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-discounted token budget per source: each document
    contributes tokens/c where c is its exact-duplicate cluster size, so
    a text duplicated across (or within) sources counts once in total —
    the Chinchilla-style effective-token accounting a mixture planner
    uses instead of raw counts, without having to pick which copy to
    keep.

    Scale shape: one window count over md5(text) partitions (uniform
    digest keys — the exact_dedup shuffle), then one keyed aggregation.
    The per-row discount is an exact-integer division; the sum goes
    through DECIMAL(30,12)."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    frame = docs.select(
        "source",
        F.size(F.split(F.lower("text"), " ")).alias("toks"),
        F.count("*").over(w).alias("c"),
    )
    disc = (F.col("toks") / F.col("c").cast("double")).cast("decimal(30,12)")
    return frame.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").cast("long").alias("raw_tokens"),
        F.round(F.sum(disc).cast("double"), 4).alias("discounted_tokens"),
    )


# ---------------------------------------------------------------------------
# Stratified k-fold assignment — hash folds + balance audit
# ---------------------------------------------------------------------------

_KFOLDS = 5


@register(
    "stratified_kfold_balance",
    f"""
    WITH f AS (
        SELECT lang,
               {portable_hash64_sql("CAST(doc_id AS VARCHAR)")}
                   % {_KFOLDS} AS fold
        FROM documents
    ),
    lt AS (SELECT lang, CAST(count(*) AS BIGINT) AS lang_total FROM f GROUP BY 1)
    SELECT f.fold, f.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(lt.lang_total / CAST({_KFOLDS} AS DOUBLE), 4) AS expected,
           round(count(*) / (lt.lang_total / CAST({_KFOLDS} AS DOUBLE)) - 1, 4)
               AS rel_dev
    FROM f JOIN lt ON f.lang = lt.lang
    GROUP BY f.fold, f.lang, lt.lang_total
    """,
    tags=("X-kfold",),
)
def stratified_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold assignment by content-stable hash
    (md5 of the doc id — reproducible across runs, engines, and
    repartitioning, unlike rand()-based splits) plus the per-(fold,
    lang) balance audit that validates the folds are usable for
    stratified CV: actual vs expected count and relative deviation.

    Scale shape: fold is a per-row expression (no shuffle to assign);
    the audit is one keyed aggregation plus a broadcast join of the
    langs-sized marginal."""
    docs = table(spark, sf_dir, "documents")
    from ..functions.portable import portable_hash64

    fold = portable_hash64(F.col("doc_id").cast("string")) % _KFOLDS
    f = docs.select("lang", fold.alias("fold"))
    lt = f.groupBy("lang").agg(F.count("*").alias("lang_total"))
    expected = F.col("lang_total") / F.lit(float(_KFOLDS))
    return (
        f.join(F.broadcast(lt), "lang")
        .groupBy("fold", "lang", "lang_total")
        .agg(F.count("*").alias("n_docs"))
        .select(
            "fold",
            "lang",
            "n_docs",
            F.round(expected, 4).alias("expected"),
            F.round(F.col("n_docs") / expected - 1, 4).alias("rel_dev"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf fit — log-log OLS over the top-k vocabulary
# ---------------------------------------------------------------------------

_ZIPF_TOPK = 1000


@register(
    "vocab_zipf_fit",
    f"""
    WITH tf AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
              FROM documents)
        GROUP BY 1
        ORDER BY cnt DESC, term LIMIT {_ZIPF_TOPK}
    ),
    xy AS (
        SELECT ln(row_number() OVER (ORDER BY cnt DESC, term)) AS x,
               ln(cnt) AS y
        FROM tf
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x AS DECIMAL(30, 12))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(30, 12))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x * y AS DECIMAL(30, 12))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(x * x AS DECIMAL(30, 12))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y * y AS DECIMAL(30, 12))) AS DOUBLE) AS syy
        FROM xy
    )
    SELECT n AS n_terms,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
               AS intercept,
           round(pow(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
    tags=("X-zipf",),
)
def vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: OLS slope of log
    frequency against log rank over the top-1000 terms. A slope
    far from -1 (or a low r²) is the classic symptom of a corrupted
    corpus — boilerplate floods (slope too shallow at the head) or
    tokenizer breakage (too steep).

    Scale shape: term frequencies are one exploded aggregation; the
    top-k is a distributed TakeOrderedAndProject, so ranking and the
    log-log regression run on a k-row-bounded frame; the regression
    itself is decomposable decimal sums (the ols_trend pattern)."""
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "term")
        .limit(_ZIPF_TOPK)
    )
    w = Window.orderBy(F.desc("cnt"), "term")
    xy = tf.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    dec = "decimal(30,12)"
    s = xy.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            F.pow(n * sxy - sx * sy, 2)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# 64-bit SimHash near-dup pairs — the bounded-bucket production width
# ---------------------------------------------------------------------------

_SH64_BANDS = 4
_SH64_BAND_BITS = 16
_SH64_HAMMING_MAX = 3  # pigeonhole: hamming <= bands-1 => >=1 band equal


def _sh64_oracle() -> str:
    votes = ", ".join(
        f"sum(((strpos('0123456789abcdef', substr(md5(tok), {(j % 32) + 1}, 1))"
        f" - 1) >> {j // 32}) & 1) * 2 - count(*) AS v{j}"
        for j in range(_SH64_BANDS * _SH64_BAND_BITS)
    )
    band_exprs = ", ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN v{_SH64_BAND_BITS * b + r} > 0 THEN {1 << r} ELSE 0 END)"
            for r in range(_SH64_BAND_BITS)
        )
        + f" AS BIGINT) AS sh{b}"
        for b in range(_SH64_BANDS)
    )
    bv_case = (
        "CASE b.b "
        + " ".join(f"WHEN {b} THEN sh{b}" for b in range(_SH64_BANDS - 1))
        + f" ELSE sh{_SH64_BANDS - 1} END"
    )
    ham = " + ".join(
        f"bit_count(xor(a{b}, b{b}))" for b in range(_SH64_BANDS)
    )
    a_cols = ", ".join(f"a.sh{b} AS a{b}" for b in range(_SH64_BANDS))
    b_cols = ", ".join(f"b.sh{b} AS b{b}" for b in range(_SH64_BANDS))
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
        FROM documents
    ), votes AS (
        SELECT doc_id, {votes} FROM toks GROUP BY doc_id
    ), sims AS (
        SELECT doc_id, {band_exprs} FROM votes
    ), bands AS (
        SELECT doc_id, {", ".join(f"sh{b}" for b in range(_SH64_BANDS))}, b.b,
               {bv_case} AS bv
        FROM sims, (SELECT unnest(generate_series(0, {_SH64_BANDS - 1})) AS b) b
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               {a_cols}, {b_cols}
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT doc_id_a, doc_id_b, CAST({ham} AS BIGINT) AS hamming
    FROM cand WHERE {ham} <= {_SH64_HAMMING_MAX}
    """


@register("simhash64_hamming_pairs", _sh64_oracle(), tags=("X-simhash64",))
def simhash64_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at PRODUCTION width: a 64-bit fingerprint
    in 4×16-bit Manku bands (vs the 16-bit/4-bit-band demo form). The
    round-6 sf1 spot-bench showed why the width is the scale knob: with
    4-bit bands a band has 16 possible values, so buckets — and verify
    pairs — grow quadratically with the corpus (26× cost at 10× docs on
    BOTH engines); 16-bit bands have 65 536 values and keep buckets
    bounded, restoring the linear equi-join shape that LSH banding is
    supposed to buy. Pigeonhole is unchanged: hamming <= 3 over 64 bits
    guarantees at least one of the 4 bands is identical, so the
    candidate join loses nothing.

    Plan shape: one token explode + 64 codegen'd conditional-sum votes
    (one md5 per token, split once into 4 words), band equi-join,
    popcount verify (bit_count(xor) per band) — everything whole-stage
    codegen, one shuffle on doc_id, one on the band key."""
    from ..operators.dedup import simhash_wide

    sims = simhash_wide(
        fan_out(table(spark, sf_dir, "documents")),
        band_bits=_SH64_BAND_BITS,
        n_bands=_SH64_BANDS,
    )
    sh_cols = [f"sh{b}" for b in range(_SH64_BANDS)]
    from ..functions.lineage import truncate_lineage

    # the band frame feeds BOTH join aliases; the lazy checkpoint keeps
    # the token explode + 64-vote aggregation from running twice
    bands = truncate_lineage(
        sims.select(
            "doc_id",
            *sh_cols,
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("b"), F.col(f"sh{b}").alias("bv"))
                        for b in range(_SH64_BANDS)
                    ]
                )
            ).alias("band"),
        ).select(
            "doc_id", *sh_cols, F.col("band.b").alias("b"), F.col("band.bv").alias("bv")
        ),
        eager=False,
    )
    a = bands.select(
        F.col("doc_id").alias("doc_id_a"),
        *[F.col(f"sh{b}").alias(f"a{b}") for b in range(_SH64_BANDS)],
        "b",
        "bv",
    )
    b_ = bands.select(
        F.col("doc_id").alias("doc_id_b"),
        *[F.col(f"sh{b}").alias(f"b{b}") for b in range(_SH64_BANDS)],
        "b",
        "bv",
    )
    cand = (
        a.join(b_, ["b", "bv"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .drop("b", "bv")
        .distinct()
    )
    ham = None
    for i in range(_SH64_BANDS):
        term = F.bit_count(
            F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}"))
        )
        ham = term if ham is None else ham + term
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= _SH64_HAMMING_MAX)
        .select("doc_id_a", "doc_id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# l-diversity audit — the sensitive-attribute companion to k-anonymity
# ---------------------------------------------------------------------------


@register(
    "l_diversity_audit",
    """
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS k_size,
               CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
                    AS BIGINT) AS l_distinct
        FROM customer GROUP BY 1, 2
    )
    SELECT l_distinct,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(k_size) AS BIGINT) AS n_rows,
           CAST(min(k_size) AS BIGINT) AS min_k
    FROM classes GROUP BY 1
    """,
    tags=("X-l-diversity",),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity profile: for each quasi-identifier equivalence class,
    how many DISTINCT sensitive values (account-balance bands) it
    contains — k-anonymity's necessary complement (a k=50 class whose 50
    rows all share one sensitive value still leaks it; [[k_anonymity_audit]]
    cannot see that). Output is the l histogram with class counts and
    the smallest class at each l.

    Scale shape: one count-distinct aggregation keyed by the class pair
    (Spark expands it to a two-level exact aggregate — no window, no
    join), then a metadata-scale re-agg. The sensitive value is banded
    with floor() explicitly because DuckDB's double→int cast rounds
    while Spark's truncates."""
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("k_size"),
        F.count_distinct(
            F.floor(F.col("c_acctbal") / 1000).cast("long")
        ).alias("l_distinct"),
    )
    return classes.groupBy("l_distinct").agg(
        F.count("*").alias("n_classes"),
        F.sum("k_size").alias("n_rows"),
        F.min("k_size").alias("min_k"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation — quartile-banded customer value segments
# ---------------------------------------------------------------------------


@register(
    "rfm_segmentation",
    """
    WITH cust AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate),
                         (SELECT max(o_orderdate) FROM orders)) AS recency_d,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(30, 8))), 2)
                    AS DOUBLE) AS monetary
        FROM orders GROUP BY 1
    ),
    b AS (
        SELECT quantile_cont(CAST(recency_d AS DOUBLE), [0.25, 0.5, 0.75]) AS rb,
               quantile_cont(CAST(frequency AS DOUBLE), [0.25, 0.5, 0.75]) AS fb,
               quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mb
        FROM cust
    ),
    seg AS (
        SELECT
            CASE WHEN recency_d <= rb[1] THEN 4 WHEN recency_d <= rb[2] THEN 3
                 WHEN recency_d <= rb[3] THEN 2 ELSE 1 END AS r_seg,
            CASE WHEN frequency <= fb[1] THEN 1 WHEN frequency <= fb[2] THEN 2
                 WHEN frequency <= fb[3] THEN 3 ELSE 4 END AS f_seg,
            CASE WHEN monetary <= mb[1] THEN 1 WHEN monetary <= mb[2] THEN 2
                 WHEN monetary <= mb[3] THEN 3 ELSE 4 END AS m_seg
        FROM cust, b
    )
    SELECT r_seg, f_seg, m_seg, CAST(count(*) AS BIGINT) AS n_customers
    FROM seg GROUP BY 1, 2, 3
    """,
    tags=("X-rfm",),
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation — the
    classic customer-value cube, built the scale-correct way: NO ntile
    window (a global sort of the customer frame); instead the three
    quartile boundary triples are ONE exact-percentile aggregate over
    the already customer-grain frame, broadcast back as a single row,
    and banding is a codegen CASE per row. Spark's percentile() and
    DuckDB's quantile_cont agree exactly (both linear interpolation —
    the value_percentiles_exact precedent).

    Determinism: recency is integer days from the global max order date
    (one-row broadcast); frequency is a count; monetary aggregates in
    DECIMAL(30,8) then rounds — so every banded value and every
    boundary is bit-identical across engines, and band comparisons
    cannot flip."""
    o = table(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("maxd"))
    # recency = days from the customer's LAST order to the global max
    # = MIN over their orders of datediff (max(datediff) would be the
    # first order)
    cust = (
        o.join(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("maxd"), F.col("o_orderdate"))).alias(
                "recency_d"
            ),
            F.count("*").alias("frequency"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(30,8)")), 2)
            .cast("double")
            .alias("monetary"),
        )
    )
    b = cust.agg(
        F.percentile(F.col("recency_d").cast("double"), F.lit([0.25, 0.5, 0.75])).alias("rb"),
        F.percentile(F.col("frequency").cast("double"), F.lit([0.25, 0.5, 0.75])).alias("fb"),
        F.percentile(F.col("monetary"), F.lit([0.25, 0.5, 0.75])).alias("mb"),
    )

    def band(col, bounds, invert=False):
        lo, hi = (4, 1) if invert else (1, 4)
        return (
            F.when(col <= F.element_at(bounds, 1), F.lit(lo))
            .when(col <= F.element_at(bounds, 2), F.lit(3 if invert else 2))
            .when(col <= F.element_at(bounds, 3), F.lit(2 if invert else 3))
            .otherwise(F.lit(hi))
        )

    seg = cust.join(F.broadcast(b)).select(
        band(F.col("recency_d"), F.col("rb"), invert=True).alias("r_seg"),
        band(F.col("frequency"), F.col("fb")).alias("f_seg"),
        band(F.col("monetary"), F.col("mb")).alias("m_seg"),
    )
    return seg.groupBy("r_seg", "f_seg", "m_seg").agg(
        F.count("*").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# Multimodal audio metadata — real WAV header decode end to end
# ---------------------------------------------------------------------------


@register(
    "multimodal_audio_metadata",
    """
    SELECT doc_id AS media_id,
           CAST(doc_id % 2 + 1 AS INT) AS channels,
           CAST(([8000, 16000, 22050, 44100])[CAST(doc_id % 4 + 1 AS INT)]
                AS INT) AS sample_rate_hz,
           CAST(16 AS INT) AS bits_per_sample,
           CAST(((doc_id % 100 + 1) * 1024 * 1000)
                // (([8000, 16000, 22050, 44100])[CAST(doc_id % 4 + 1 AS INT)]
                    * (doc_id % 2 + 1) * 2) AS BIGINT) AS duration_ms
    FROM documents
    """,
    tags=("X-multimodal-audio",),
)
def multimodal_audio_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio header decode end to end — the WAV sibling of
    multimodal_image_dimensions: canonical 44-byte RIFF/WAVE PCM headers
    are synthesized per document (magics + little-endian fmt fields, all
    native column expressions), then ``audio_metadata`` parses channels /
    sample rate / bit depth / duration back OUT OF THE BYTES
    executor-side (Arrow-batched pandas, a batch of blobs at a time).
    The oracle computes the same fields arithmetically — a mismatch
    anywhere in the little-endian byte plumbing or the RIFF parser
    breaks the hash. Scale shape: one narrow scan, one Python boundary
    carrying ~44 bytes/row, no shuffle at all."""
    from ..operators.multimodal import audio_metadata

    docs = table(spark, sf_dir, "documents")

    def le(col, nbytes):
        return F.concat(
            *[
                F.unhex(F.lpad(F.hex(F.shiftright(col, 8 * i) % 256), 2, "0"))
                for i in range(nbytes)
            ]
        )

    ch = (F.col("doc_id") % 2 + 1).cast("long")
    sr = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(22050), F.lit(44100)),
        (F.col("doc_id") % 4 + 1).cast("int"),
    ).cast("long")
    bits = F.lit(16).cast("long")
    data_size = ((F.col("doc_id") % 100 + 1) * 1024).cast("long")
    byte_rate = sr * ch * 2
    block_align = ch * 2
    payload = F.concat(
        F.lit(b"RIFF"),
        le(data_size + 36, 4),
        F.lit(b"WAVEfmt "),
        le(F.lit(16).cast("long"), 4),   # fmt chunk size
        le(F.lit(1).cast("long"), 2),    # PCM
        le(ch, 2),
        le(sr, 4),
        le(byte_rate, 4),
        le(block_align, 2),
        le(bits, 2),
        F.lit(b"data"),
        le(data_size, 4),
    )
    media = docs.select(F.col("doc_id").alias("media_id"), payload.alias("payload"))
    return audio_metadata(media)


# ---------------------------------------------------------------------------
# EWMA daily volume — exponentially-weighted recency metric, decimal-exact
# ---------------------------------------------------------------------------

_EWMA_LOOKBACK = 30  # days; with half-life 1d, older weights < 1e-9


@register(
    "ewma_daily_volume",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    last_d AS (
        SELECT event_type, max(day) AS last_day FROM daily GROUP BY 1
    ),
    w AS (
        SELECT d.event_type, l.last_day,
               date_diff('day', d.day, l.last_day) AS k, d.n
        FROM daily d JOIN last_d l ON d.event_type = l.event_type
        WHERE date_diff('day', d.day, l.last_day) < {_EWMA_LOOKBACK}
    )
    SELECT event_type,
           strftime(last_day, '%Y-%m-%d') AS last_day,
           CAST(count(*) AS BIGINT) AS n_days_used,
           round(CAST(sum(CAST(n * pow(0.5, k) AS DECIMAL(38, 30)))
                      AS DOUBLE)
                 / CAST(sum(CAST(pow(0.5, k) AS DECIMAL(38, 30)))
                        AS DOUBLE), 6) AS ewma_volume
    FROM w GROUP BY 1, 2
    """,
    tags=("X-ewma",),
)
def ewma_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event volume
    (calendar-day decay, half-life = 1 day, truncated at
    30 days) — the recency-weighted "current rate" a
    monitor alerts on, normalized over observed days so gaps don't
    deflate it.

    EWMA is usually a sequential recursion (hostile to both distributed
    execution and cross-engine reproducibility: float pow/sum drift).
    This form is closed-from and EXACT by construction: the decay base
    is 1/2, so every weight 2^-k (k < 30) is an exact
    binary fraction — n·pow(0.5, k) is bit-exact in double on any
    engine, converts exactly to DECIMAL(38,30) (k decimal digits of
    scale), and the decimal sums are addition-order-free. The final
    quotient divides two exactly-agreed doubles. Scale shape: one
    reduction to the (type, day) grid, a types-sized broadcast of
    last-day, one keyed aggregate — no window, no recursion."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    last_d = daily.groupBy("event_type").agg(F.max("day").alias("last_day"))
    w = (
        daily.join(F.broadcast(last_d), "event_type")
        .withColumn("k", F.datediff("last_day", "day"))
        .filter(F.col("k") < _EWMA_LOOKBACK)
    )
    dec = "decimal(38,30)"
    wt = F.pow(F.lit(0.5), F.col("k"))
    return (
        w.groupBy("event_type", F.date_format("last_day", "yyyy-MM-dd").alias("last_day"))
        .agg(
            F.count("*").alias("n_days_used"),
            (
                F.sum((F.col("n") * wt).cast(dec)).cast("double")
                / F.sum(wt.cast(dec)).cast("double")
            ).alias("raw")
        )
        .select(
            "event_type",
            "last_day",
            "n_days_used",
            F.round("raw", 6).alias("ewma_volume"),
        )
    )


# ---------------------------------------------------------------------------
# Functional-dependency audit — which implied column dependencies hold?
# ---------------------------------------------------------------------------

_FD_CANDIDATES = (
    # (label, table, determinant, dependent)
    ("customer: name -> custkey", "customer", "c_name", "c_custkey"),
    ("part: partkey -> brand", "part", "p_partkey", "p_brand"),
    ("part: brand -> type", "part", "p_brand", "p_type"),
    ("orders: orderkey -> custkey", "orders", "o_orderkey", "o_custkey"),
    ("supplier: nationkey -> acctbal", "supplier", "s_nationkey", "s_acctbal"),
)


def _fd_oracle() -> str:
    blocks = [
        f"""
    SELECT '{label}' AS fd,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
           round(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS violation_rate
    FROM (SELECT {x}, count(DISTINCT {y}) AS ndv FROM {tbl} GROUP BY 1)"""
        for label, tbl, x, y in _FD_CANDIDATES
    ]
    return " UNION ALL ".join(blocks)


@register("functional_dependency_audit", _fd_oracle(), tags=("X-fd-audit",))
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit of candidate functional dependencies X -> Y:
    for each, how many determinant groups exist and what fraction hold
    more than one dependent value (a violated FD is either dirty data or
    a falsified schema assumption — the check a warehouse runs before
    keying a dimension or denormalizing on the assumption). Candidates
    span true keys (orderkey -> custkey: rate 0), plausible-but-false
    rules (brand -> type), and near-keys.

    Scale shape: one count-distinct aggregation per candidate (Spark's
    two-level exact expansion), each collapsing to a ONE-ROW summary
    before the union — the union concatenates five single-row frames,
    never data."""
    out = None
    for label, tbl, x, y in _FD_CANDIDATES:
        t = table(spark, sf_dir, tbl)
        g = t.groupBy(x).agg(F.count_distinct(y).alias("ndv"))
        viol = F.sum((F.col("ndv") > 1).cast("int"))
        row = g.agg(
            F.lit(label).alias("fd"),
            F.count("*").alias("n_groups"),
            viol.cast("long").alias("n_violating"),
            F.round(viol / F.count("*").cast("double"), 6).alias(
                "violation_rate"
            ),
        ).select("fd", "n_groups", "n_violating", "violation_rate")
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Dedup report staples: cluster-size histogram + conflicting-label dups
# ---------------------------------------------------------------------------


_PREFIX_FP = (
    "md5(array_to_string(string_split(lower(text), ' ')[1:8], ' '))"
)


def _prefix_fp_col():
    return F.md5(
        F.array_join(F.slice(F.split(F.lower("text"), " "), 1, 8), " ")
    )


@register(
    "dup_cluster_size_histogram",
    f"""
    WITH clusters AS (
        SELECT {_PREFIX_FP} AS digest, CAST(count(*) AS BIGINT) AS csize
        FROM documents GROUP BY 1
    )
    SELECT csize,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(csize) AS BIGINT) AS n_docs
    FROM clusters GROUP BY 1
    """,
    tags=("X-dup-histogram",),
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram over the OPENING-BOILERPLATE fingerprint
    (md5 of the first 8 words) — the first table of a dedup report: how
    much of the corpus is singleton openings vs shared templates (the
    tail row is the template flooding the crawl). Prefix-fingerprint
    grain deliberately: whole-text md5 clusters barely exist in a clean
    corpus, while shared openings are exactly where boilerplate shows
    first. One digest-keyed aggregation, then a metadata-scale
    re-agg — the dedup analog of the k-anonymity class histogram."""
    docs = table(spark, sf_dir, "documents")
    clusters = docs.groupBy(_prefix_fp_col().alias("digest")).agg(
        F.count("*").alias("csize")
    )
    return clusters.groupBy("csize").agg(
        F.count("*").alias("n_clusters"),
        F.sum("csize").alias("n_docs"),
    )


@register(
    "conflicting_label_duplicates",
    f"""
    WITH clusters AS (
        SELECT {_PREFIX_FP} AS digest,
               CAST(count(*) AS BIGINT) AS csize,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM documents GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_dup_clusters,
           CAST(sum(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS lang_conflict_clusters,
           CAST(sum(CASE WHEN n_langs > 1 THEN csize ELSE 0 END) AS BIGINT)
               AS lang_conflict_docs,
           CAST(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS cross_source_clusters,
           round(sum(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS lang_conflict_rate
    FROM clusters WHERE csize > 1
    """,
    tags=("X-label-conflict",),
)
def conflicting_label_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise detection via shared-opening clusters: documents
    with the SAME 8-word opening but DIFFERENT lang labels are either
    annotation noise or a template crossing languages — both worth a
    human look; openings shared across sources quantify cross-source
    mirroring. One digest-keyed aggregation carrying two
    count-distincts, collapsed to a one-row summary over the
    multi-member clusters only."""
    docs = table(spark, sf_dir, "documents")
    clusters = (
        docs.groupBy(_prefix_fp_col().alias("digest"))
        .agg(
            F.count("*").alias("csize"),
            F.count_distinct("lang").alias("n_langs"),
            F.count_distinct("source").alias("n_sources"),
        )
        .filter(F.col("csize") > 1)
    )
    lang_conf = F.sum((F.col("n_langs") > 1).cast("int"))
    return clusters.agg(
        F.count("*").alias("n_dup_clusters"),
        lang_conf.cast("long").alias("lang_conflict_clusters"),
        F.sum(F.when(F.col("n_langs") > 1, F.col("csize")).otherwise(F.lit(0)))
        .cast("long")
        .alias("lang_conflict_docs"),
        F.sum((F.col("n_sources") > 1).cast("int"))
        .cast("long")
        .alias("cross_source_clusters"),
        F.round(lang_conf / F.count("*").cast("double"), 6).alias(
            "lang_conflict_rate"
        ),
    )
