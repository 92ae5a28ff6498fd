"""Round-3 curation & analytics queries.

Corpus-filtering heuristics in the published-pipeline mold (Gopher /
C4-style rule stacks), dataset profiling, the moment/rank aggregate
surface, and leakage-safe splitting at near-dup-cluster granularity.
All pure column expressions / keyed windows — no Python in the hot path,
every entry backed by an exact DuckDB oracle.

Reference scope note: the reference engine (gabrielAHN/Citibike-Deep-Dive)
stops at BI-shape aggregations; these extend the same QuerySpec contract
to the training-data-pipeline surface (SURVEY.md §2 "beyond-reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import portable_hash64, portable_hash64_sql
from ..functions.timeutil import ts_micros
from ..operators.fanout import fan_out
from .catalog import register, table
from .gates import (
    GOPHER_MAX_FRAC_DUP_WORDS,
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_WORDS,
    gopher_keep_expr,
    gopher_metrics,
)
from .training import _BANDS_CTE, _MINHASH_CTE, _PAIRS_CTE, _SHINGLES_CTE

# ---------------------------------------------------------------------------
# Gopher-style quality rule stack (Rae et al. 2021 §A1.1 heuristics,
# re-expressed as one narrow projection). Thresholds are tuned to the
# synthetic corpus (words 10-99, median 56) so both branches occur.
# ---------------------------------------------------------------------------

_W = "string_split(lower(text), ' ')"


@register(
    "gopher_quality_rules",
    f"""
    SELECT doc_id,
           CAST(nw AS BIGINT) AS n_words,
           round(mwl, 4) AS mean_word_len,
           round(fdup, 4) AS frac_dup_words,
           CAST(CASE WHEN nw BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                      AND mwl BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                                  AND {GOPHER_MAX_MEAN_WORD_LEN}
                      AND fdup < {GOPHER_MAX_FRAC_DUP_WORDS}
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM (
        SELECT doc_id,
               len(w) AS nw,
               CAST(list_aggregate(list_transform(w, x -> len(x)), 'sum')
                    AS DOUBLE) / len(w) AS mwl,
               1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS fdup
        FROM (SELECT doc_id, {_W} AS w FROM documents)
    )
    """,
    tags=("X-gopher-rules",),
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document quality gate: word-count bounds, mean
    word length window, duplicate-word fraction cap -> keep flag. Array
    HOFs only — one narrow pass, no explode, no shuffle."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    m = gopher_metrics("text")
    return docs.select(
        "doc_id",
        m["nw"].cast("long").alias("n_words"),
        F.round(m["mwl"], 4).alias("mean_word_len"),
        F.round(m["fdup"], 4).alias("frac_dup_words"),
        gopher_keep_expr("text").alias("keep"),
    )


@register(
    "c4_style_filters",
    f"""
    SELECT doc_id,
           CAST(too_short AS INT) AS too_short,
           CAST(has_blacklist_term AS INT) AS has_blacklist_term,
           CAST(excessive_repetition AS INT) AS excessive_repetition,
           CAST(CASE WHEN NOT (too_short OR has_blacklist_term
                               OR excessive_repetition)
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM (
        SELECT doc_id,
               len(w) < 25 AS too_short,
               list_contains(w, 'lorem') OR list_contains(w, 'javascript')
                   AS has_blacklist_term,
               CAST(list_max(list_transform(list_distinct(w),
                        d -> len(list_filter(w, x -> x = d)))) AS DOUBLE)
                   / len(w) > 0.15 AS excessive_repetition
        FROM (SELECT doc_id, {_W} AS w FROM documents)
    )
    """,
    tags=("X-c4-filters",),
)
def c4_style_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style rule flags (Raffel et al. 2020 §2.2): minimum length,
    blacklist terms, single-token domination. The max-frequency scan is
    an array HOF (O(distinct·n) per doc on <=100-word docs) — stays
    inside whole-stage codegen instead of paying an explode + groupBy
    shuffle per document."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    w = F.split(F.lower("text"), " ")
    too_short = F.size(w) < 25
    blacklist = F.array_contains(w, "lorem") | F.array_contains(w, "javascript")
    max_freq = F.expr(
        "array_max(transform(array_distinct(split(lower(text), ' ')),"
        " d -> size(filter(split(lower(text), ' '), x -> x = d))))"
    ).cast("double") / F.size(w)
    rep = max_freq > 0.15
    keep = (~(too_short | blacklist | rep)).cast("int")
    return docs.select(
        "doc_id",
        too_short.cast("int").alias("too_short"),
        blacklist.cast("int").alias("has_blacklist_term"),
        rep.cast("int").alias("excessive_repetition"),
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# Dataset profiling: ANALYZE-style per-column stats in ONE scan.
# ---------------------------------------------------------------------------


_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@register(
    "column_profile",
    " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               CAST(count(*) - count({c}) AS BIGINT) AS null_count,
               CAST(count(DISTINCT {c}) AS BIGINT) AS distinct_count,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM documents
        """
        for c in _PROFILE_COLS
    ),
    tags=("X-column-profile",),
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile (null count, exact distinct, min/max) of the
    documents table in a SINGLE scan: one wide aggregation row, then a
    stack() unpivot of the 5x4 stat cells. The oracle spells it as 5
    UNION ALL passes; Catalyst's multi-distinct Expand keeps ours at one
    scan. min/max aggregate on the native type, THEN cast to string —
    lexicographic min of a bigint would be wrong."""
    docs = table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        col = F.col(c)
        aggs += [
            (F.count(F.lit(1)) - F.count(col)).alias(f"nc_{c}"),
            F.countDistinct(col).alias(f"dc_{c}"),
            F.min(col).cast("string").alias(f"mn_{c}"),
            F.max(col).cast("string").alias(f"mx_{c}"),
        ]
    wide = docs.agg(*aggs)
    cells = ", ".join(
        f"'{c}', nc_{c}, dc_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {cells}) AS "
            "(col_name, null_count, distinct_count, min_value, max_value)"
        )
    )


# ---------------------------------------------------------------------------
# Moment aggregates + rank-function window surface.
# ---------------------------------------------------------------------------


@register(
    "moment_aggregates",
    """
    SELECT l_returnflag,
           round(median(l_quantity), 4) AS qty_median,
           round(stddev_samp(l_discount), 4) AS disc_stddev,
           round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("X-moment-aggs",),
)
def moment_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / sample stddev / correlation / covariance per group —
    Spark and DuckDB share the interpolated-median and sample-moment
    definitions, so these hash-match exactly at 4 dp. corr/covar are
    single-pass co-moment aggregations (decomposable, map-side
    combinable). The median does NOT use Spark's sort-bearing median
    aggregate: with only |returnflag| groups, every row lands in one of
    3 aggregation buffers (3 tasks carry the whole table — a skew that
    only worsens at scale). l_quantity is low-cardinality, so the exact
    interpolated median falls out of a (flag, quantity) count histogram
    instead: cumulative counts locate the two middle ranks, and the
    whole median path moves |flags|x|values| rows after the map-side
    combine. 0.76 -> ~0.35 s at sf0.1; identical 4-dp values."""
    li = table(spark, sf_dir, "lineitem")
    moments = li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_discount"), 4).alias("disc_stddev"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(
            F.covar_samp("l_quantity", "l_extendedprice"), 4
        ).alias("qty_price_covar"),
    )
    from ..functions.stats import histogram_median

    # LEFT join: histogram_median emits NO row for a key whose values are
    # all NULL (its histogram is empty), while F.median keeps the group
    # with a null median. The left join restores aggregate parity —
    # such a group keeps its moments row and gets qty_median = NULL.
    medians = histogram_median(li, "l_returnflag", "l_quantity", out="med")
    return moments.join(F.broadcast(medians), "l_returnflag", "left").select(
        "l_returnflag",
        F.round("med", 4).alias("qty_median"),
        "disc_stddev",
        "qty_price_corr",
        "qty_price_covar",
    )


@register(
    "rank_function_suite",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber)
    """,
    tags=("X-rank-functions",),
)
def rank_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile over a KEYED window with a full
    deterministic tiebreak (price, orderkey, linenumber) — rank functions
    are only reproducible across engines when the ORDER BY is a total
    order. Partitioned by returnflag: no global sort at any scale."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "revenue_share_of_total",
    """
    SELECT l_returnflag, l_linestatus,
           round(rev, 2) AS revenue,
           round(rev / sum(rev) OVER (), 6) AS share
    FROM (
        SELECT l_returnflag, l_linestatus,
               sum(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    """,
    tags=("X-share-of-total",),
)
def revenue_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total: the unpartitioned window runs AFTER the group-by,
    over |returnflag x linestatus| ~ 6 rows — a single-reducer window on
    an aggregated frame is free at any input scale (the aggregation
    itself is the distributed part)."""
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    w = Window.partitionBy()
    return rev.select(
        "l_returnflag",
        "l_linestatus",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(w), 6).alias("share"),
    )


# ---------------------------------------------------------------------------
# Leakage-safe splitting: assign near-dup CLUSTERS, not documents, to
# train/val/test, so no split ever sees a near-duplicate of another's doc.
# ---------------------------------------------------------------------------


@register(
    "cluster_safe_split",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE}, {_MINHASH_CTE}, {_BANDS_CTE}, {_PAIRS_CTE},
    sym AS (
        SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
        UNION
        SELECT doc_id_b AS s, doc_id_a AS d FROM pairs
    ),
    reach AS (
        SELECT s, d FROM sym
        UNION
        SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s
    ),
    comp AS (
        SELECT s AS doc_id, least(s, min(d)) AS cluster_id
        FROM reach GROUP BY s
    )
    SELECT d.doc_id,
           coalesce(c.cluster_id, d.doc_id) AS cluster_id,
           CASE WHEN {portable_hash64_sql(
               "'csplit:' || CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)"
           )} % 10 < 8 THEN 'train'
                WHEN {portable_hash64_sql(
               "'csplit:' || CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)"
           )} % 10 = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """,
    tags=("X-cluster-safe-split",),
)
def cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split at near-dup-CLUSTER granularity:
    LSH pairs -> connected components -> every member of a cluster hashes
    to the SAME split (singletons are their own cluster). This closes the
    contamination channel a doc-level split leaves open: near-identical
    docs landing on both sides of the train/eval fence. The split hash is
    the portable md5 family, so the assignment replays identically on both
    engines, across retries, and at any parallelism."""
    from ..operators.dedup import connected_components, lsh_candidate_pairs

    docs = fan_out(table(spark, sf_dir, "documents"))
    comp = connected_components(lsh_candidate_pairs(docs, k=4, rows_per_band=2))
    joined = docs.select("doc_id").join(comp, "doc_id", "left")
    cluster = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    bucket = portable_hash64(
        F.concat(F.lit("csplit:"), cluster.cast("string"))
    ) % 10
    return joined.select(
        "doc_id",
        cluster.alias("cluster_id"),
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Operational diagnostics + graph + vision-batching surface.
# ---------------------------------------------------------------------------


@register(
    "key_skew_report",
    """
    WITH counts AS (
        SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ), mx AS (SELECT max(n) AS mxn FROM counts)
    SELECT CAST(sum(n) AS BIGINT) AS total_rows,
           CAST(count(*) AS BIGINT) AS distinct_keys,
           CAST(max(n) AS BIGINT) AS max_key_rows,
           round(quantile_cont(n, 0.5), 4) AS p50_key_rows,
           round(quantile_cont(n, 0.99), 4) AS p99_key_rows,
           round(max(n) / (CAST(sum(n) AS DOUBLE) / count(*)), 4)
               AS skew_ratio,
           CAST(min(CASE WHEN n = (SELECT mxn FROM mx) THEN user_id END)
                AS BIGINT) AS heaviest_key
    FROM counts
    """,
    tags=("X-skew-report",),
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution diagnostic that decides whether a 100 TB job needs
    salting BEFORE it runs: per-key counts in one keyed aggregation, then
    total/distinct/max/percentile/skew-ratio/heaviest-key over the (small)
    per-key frame. skew_ratio = hottest key vs mean — the number the
    salted-aggregate and AQE-skew-join paths act on. The unpartitioned
    second aggregate sees |keys| rows, never input rows."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    mx = counts.withColumn("mxn", F.max("n").over(Window.partitionBy()))
    return mx.agg(
        F.sum("n").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("distinct_keys"),
        F.max("n").cast("long").alias("max_key_rows"),
        F.round(F.expr("percentile(n, 0.5)"), 4).alias("p50_key_rows"),
        F.round(F.expr("percentile(n, 0.99)"), 4).alias("p99_key_rows"),
        F.round(
            F.max("n") / (F.sum("n").cast("double") / F.count("*")), 4
        ).alias("skew_ratio"),
        F.min(F.when(F.col("n") == F.col("mxn"), F.col("user_id")))
        .cast("long")
        .alias("heaviest_key"),
    )


@register(
    "dedup_graph_triangles",
    f"""
    WITH {_SHINGLES_CTE}, {_MINHASH_CTE}, {_BANDS_CTE}, {_PAIRS_CTE}
    SELECT p1.doc_id_a AS doc_a, p1.doc_id_b AS doc_b, p2.doc_id_b AS doc_c
    FROM pairs p1
    JOIN pairs p2 ON p1.doc_id_b = p2.doc_id_a
    JOIN pairs p3 ON p1.doc_id_a = p3.doc_id_a AND p2.doc_id_b = p3.doc_id_b
    """,
    tags=("X-graph-triangles",),
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the near-dup candidate graph — the classic
    distributed-graph kernel (clustering coefficient, community density)
    over LSH pairs. Edges are canonically oriented (a<b), so each
    triangle materializes exactly once via two equi-joins; at scale both
    joins shuffle on doc_id with no all-pairs blowup (edge count, not
    node-pairs, bounds the work)."""
    from ..operators.dedup import lsh_candidate_pairs

    docs = fan_out(table(spark, sf_dir, "documents"))
    pairs = lsh_candidate_pairs(docs, k=4, rows_per_band=2).select(
        "doc_id_a", "doc_id_b"
    )
    p1 = pairs.alias("p1")
    p2 = pairs.alias("p2")
    p3 = pairs.alias("p3")
    return (
        p1.join(p2, F.col("p1.doc_id_b") == F.col("p2.doc_id_a"))
        .join(
            p3,
            (F.col("p1.doc_id_a") == F.col("p3.doc_id_a"))
            & (F.col("p2.doc_id_b") == F.col("p3.doc_id_b")),
        )
        .select(
            F.col("p1.doc_id_a").alias("doc_a"),
            F.col("p1.doc_id_b").alias("doc_b"),
            F.col("p2.doc_id_b").alias("doc_c"),
        )
    )


@register(
    "aspect_ratio_batch_plan",
    """
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(ceil(count(*) / 32.0) AS BIGINT) AS n_batches
    FROM (
        SELECT round((CAST(doc_id % 1920 + 16 AS DOUBLE)
                      / (doc_id % 1080 + 16)) * 4) / 4 AS bucket
        FROM documents
    )
    GROUP BY bucket
    """,
    tags=("X-aspect-bucketing",),
)
def aspect_ratio_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-training batch packing: images grouped into quarter-step
    aspect-ratio buckets (so a batch resizes without distortion), with
    per-bucket batch counts at batch_size=32. Dims use the same synthetic
    width/height as multimodal_image_dimensions (which proves the real
    byte-level decode); here the point is the bucketing plan — one keyed
    aggregation, no shuffle beyond it."""
    docs = table(spark, sf_dir, "documents")
    w = (F.col("doc_id") % 1920 + 16).cast("double")
    h = (F.col("doc_id") % 1080 + 16).cast("double")
    bucket = F.round(w / h * 4) / 4
    return (
        docs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_images"),
            F.ceil(F.count("*") / 32.0).alias("n_batches"),
        )
    )


# ---------------------------------------------------------------------------
# Feature conditioning + dataset manifest.
# ---------------------------------------------------------------------------


@register(
    "winsorize_values",
    """
    WITH bounds AS (
        SELECT event_type,
               quantile_cont(CAST(value AS DOUBLE), 0.01) AS lo,
               quantile_cont(CAST(value AS DOUBLE), 0.99) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round(CAST(e.value AS DOUBLE), 4) AS value,
           round(least(greatest(CAST(e.value AS DOUBLE), b.lo), b.hi), 4)
               AS value_winsorized,
           CAST(CAST(e.value AS DOUBLE) < b.lo
                OR CAST(e.value AS DOUBLE) > b.hi AS INT) AS clipped
    FROM events e JOIN bounds b USING (event_type)
    """,
    tags=("X-winsorize",),
)
def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (clip at p1/p99) — the outlier conditioning
    step before a numeric column feeds training. Two-phase: grouped exact
    percentiles build a |groups|-row bounds frame, broadcast back onto the
    stream — input rows shuffle once (the percentile group-by); the clip
    itself is a narrow map. At 100 TB swap percentile for
    approx_percentile and nothing else changes."""
    ev = table(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("double")
    )
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.01)").alias("lo"),
        F.expr("percentile(value, 0.99)").alias("hi"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return j.select(
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
        F.round(clipped, 4).alias("value_winsorized"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .cast("int")
        .alias("clipped"),
    )


@register(
    "corpus_manifest",
    f"""
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(w)) AS BIGINT) AS n_words,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           round(avg(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w)), 4)
               AS mean_dup_word_frac,
           round(min(len(w)), 4) AS min_words,
           round(max(len(w)), 4) AS max_words
    FROM (SELECT source, lang, n_chars, {_W} AS w FROM documents)
    GROUP BY source, lang
    """,
    tags=("X-corpus-manifest",),
)
def corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card in one pass: per (source, lang) doc/word/char
    totals, mean duplicate-word fraction, min/max doc length. Everything
    decomposable -> map-side combine; the manifest of a 100 TB corpus is
    one keyed aggregation."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    w = F.split(F.lower("text"), " ")
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / F.size(w)
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(w)).cast("long").alias("n_words"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.round(F.avg(dup_frac), 4).alias("mean_dup_word_frac"),
        F.round(F.min(F.size(w)), 4).cast("double").alias("min_words"),
        F.round(F.max(F.size(w)), 4).cast("double").alias("max_words"),
    )


@register(
    "temporal_split_embargo",
    """
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           CASE WHEN ts <  TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
                WHEN ts >= TIMESTAMP '2024-01-23 00:00:00' THEN 'test'
                ELSE 'embargo' END AS split
    FROM events
    """,
    tags=("X-temporal-split",),
)
def temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based split with an embargo gap: train strictly before the
    cutoff, test strictly after cutoff+embargo, the 3-day gap between dropped
    — the leakage control for temporally-autocorrelated data (a random
    split would let near-future rows teach the past). Pure narrow
    projection; the timestamp literals compare as naive wall clock on
    both engines (events.ts is TIMESTAMP_NTZ)."""
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    test_from = F.lit("2024-01-23 00:00:00").cast("timestamp_ntz")
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.when(F.col("ts") < cutoff, "train")
        .when(F.col("ts") >= test_from, "test")
        .otherwise("embargo")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Warehouse-classic surface: SCD2 history, partition checksums.
# ---------------------------------------------------------------------------


@register(
    "scd2_history_build",
    """
    WITH marked AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), regimes AS (
        SELECT user_id, event_type, ts,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS regime
        FROM marked
    ), spans AS (
        SELECT user_id, regime, event_type, min(ts) AS valid_from
        FROM regimes GROUP BY user_id, regime, event_type
    )
    SELECT user_id,
           event_type,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(valid_from) OVER (PARTITION BY user_id
               ORDER BY valid_from), '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
               ORDER BY valid_from) IS NULL THEN 1 ELSE 0 END AS INT)
               AS is_current
    FROM spans
    """,
    tags=("X-scd2",),
)
def scd2_history_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an event log: each
    per-user run of equal event_type collapses to one row with
    valid_from/valid_to interval and an is_current flag — the
    change-tracking table every warehouse maintains. Three keyed steps
    (change mark -> regime cumsum -> span agg) + one keyed lead; every
    window partitions by user_id, so no global sort anywhere."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    regimes = marked.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("regime"),
    )
    spans = regimes.groupBy("user_id", "regime", "event_type").agg(
        F.min("ts").alias("valid_from")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    nxt = F.lead("valid_from").over(w2)
    return spans.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )


@register(
    "partition_checksums",
    f"""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor({portable_hash64_sql(
               "l_orderkey || '|' || l_linenumber || '|' || l_quantity"
               " || '|' || l_extendedprice || '|' || l_returnflag"
           )}) AS BIGINT) AS row_checksum
    FROM lineitem
    GROUP BY 1
    """,
    tags=("X-partition-checksums",),
)
def partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy partition fingerprints: per ship-month, row count +
    XOR of a canonical per-row portable hash. Two replicas (or a source
    and its migrated copy) compare |partitions| tiny rows instead of
    re-reading the data — the validation primitive for cross-cluster
    copies. XOR is the right combiner: order-independent, overflow-free,
    decomposable (map-side combinable), and any single-row difference
    flips the checksum. fan_out: the per-row md5 is the cost, and a
    single-file extract otherwise hashes on one core (1.84 -> 0.98 s at
    sf0.1, fan-out shuffle included); no-op on well-split inputs."""
    from ..operators.fanout import fan_out

    li = fan_out(table(spark, sf_dir, "lineitem"))
    row_key = F.concat_ws(
        "|",
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_quantity"),
        F.col("l_extendedprice"),
        F.col("l_returnflag"),
    )
    return li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")
    ).agg(
        F.count("*").alias("n_rows"),
        F.bit_xor(portable_hash64(row_key)).alias("row_checksum"),
    )


@register(
    "session_path_trigrams",
    """
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                   AS session_id
        FROM marked
    ), grams AS (
        SELECT event_type
               || '>' || lead(event_type, 1) OVER w2
               || '>' || lead(event_type, 2) OVER w2 AS path,
               lead(event_type, 2) OVER w2 IS NOT NULL AS complete
        FROM sess
        WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM grams WHERE complete
    GROUP BY path ORDER BY n DESC, path LIMIT 20
    """,
    tags=("X-path-mining",),
)
def session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey mining: the 20 most common event-type trigram paths
    WITHIN 30-minute-gap sessions (a trigram never spans a session
    boundary because the lead window is keyed by (user, session)). All
    windows are user-keyed; the final top-20 is TakeOrdered over the
    |distinct paths| aggregate — at most |types|^3 rows, not input rows."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = ts_micros(ev) - F.lag(ts_micros(ev)).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w2 = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    t2 = F.lead("event_type", 2).over(w2)
    grams = sess.select(
        F.concat_ws(
            ">", "event_type", F.lead("event_type", 1).over(w2), t2
        ).alias("path"),
        t2.isNotNull().alias("complete"),
    )
    return (
        grams.filter("complete")
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@register(
    "class_balance_downsample",
    f"""
    WITH sized AS (
        SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ), target AS (SELECT min(n) AS t FROM sized),
    ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY
                   {portable_hash64_sql("'bal:' || CAST(doc_id AS VARCHAR)")},
                   doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, lang FROM ranked
    WHERE rk <= (SELECT t FROM target)
    """,
    tags=("X-class-balance",),
)
def class_balance_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every lang keeps exactly
    min-class-size docs, selected by deterministic portable-hash rank —
    replayable across engines, retries, and parallelism (no rand()). The
    per-class rank window is keyed by lang; the min-class-size scalar is
    a broadcast one-row frame. The standard majority-class trim before
    training a classifier on skewed labels."""
    docs = table(spark, sf_dir, "documents")
    target = docs.groupBy("lang").count().agg(F.min("count").alias("t"))
    w = Window.partitionBy("lang").orderBy(
        portable_hash64(F.concat(F.lit("bal:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    ranked = docs.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
    return (
        ranked.join(F.broadcast(target))
        .filter(F.col("rk") <= F.col("t"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# Round-5: declarative data-quality constraint audit
# ---------------------------------------------------------------------------


@register(
    "constraint_audit",
    """
    SELECT 'orders.o_orderkey unique' AS rule,
           CAST(count(*) AS BIGINT) AS n_checked,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'lineitem.l_orderkey fk orders',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders.o_custkey fk customer',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'events.value non-null',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'orders.o_orderdate in [1992,2003)',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01 00:00:00'
                          OR o_orderdate >= TIMESTAMP '2003-01-01 00:00:00'
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    """,
    tags=("X-dq-constraints",),
)
def constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (expectations-suite shape): each
    rule evaluates to (rows checked, violations) — uniqueness as
    count-minus-distinct, referential integrity as a LEFT-join null
    probe (left_anti would lose the checked-row denominator), null and
    range rules as conditional sums. Every rule is a single aggregation
    over its table; the FK probes are the only joins and shuffle on the
    FK — at 100 TB you run this as the post-write validation pass, and
    a dim-sized parent side broadcasts. The output is metadata-scale
    (one row per rule), so the union is free."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cust = table(spark, sf_dir, "customer")
    ev = table(spark, sf_dir, "events")

    def _rule(name: str, df: DataFrame, viol) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(viol.cast("int")).cast("long").alias("n_violations"),
        )

    unique_orders = orders.agg(
        F.lit("orders.o_orderkey unique").alias("rule"),
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("n_violations"),
    )
    fk_li = _rule(
        "lineitem.l_orderkey fk orders",
        li.join(
            orders.select(F.col("o_orderkey").alias("_ok")),
            li.l_orderkey == F.col("_ok"),
            "left",
        ),
        F.col("_ok").isNull(),
    )
    fk_cust = _rule(
        "orders.o_custkey fk customer",
        orders.join(
            F.broadcast(cust.select(F.col("c_custkey").alias("_ck"))),
            orders.o_custkey == F.col("_ck"),
            "left",
        ),
        F.col("_ck").isNull(),
    )
    ev_null = _rule("events.value non-null", ev, F.col("value").isNull())
    lo = F.lit("1992-01-01 00:00:00").cast("timestamp")
    hi = F.lit("2003-01-01 00:00:00").cast("timestamp")
    date_range = _rule(
        "orders.o_orderdate in [1992,2003)",
        orders,
        (F.col("o_orderdate") < lo) | (F.col("o_orderdate") >= hi),
    )
    return (
        unique_orders.unionByName(fk_li)
        .unionByName(fk_cust)
        .unionByName(ev_null)
        .unionByName(date_range)
    )
