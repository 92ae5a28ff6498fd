"""Round-8 continuation batch 2: corpus-statistics / privacy / audit
methods — Good-Turing frequency smoothing at bigram grain (Good 1953;
the Gale & Sampson 1995 "Simple Good-Turing" Z_r transform and log-log
regression, which this corpus's gappy frequency-of-frequencies actually
REQUIRES), a differentially-private noisy histogram (Dwork et al. 2006
Laplace mechanism with deterministic inverse-CDF noise, completing the
k-anonymity / l-diversity / t-closeness privacy suite), Burrows' Delta
stylometry (Burrows 2002) as a source-similarity audit, and sparse
TF-IDF cosine near-duplicate pairs over shingle postings — the classic
weighted complement of the unweighted shingle-Jaccard dedup family.

Engine-exactness: the established fixed-point discipline — ln/idf
values become micro-unit integers before any sum, moments and norms
accumulate as decimal(38,0) (Spark) / HUGEINT (DuckDB), and the only
doubles are final single divisions/sqrts (IEEE-correctly-rounded)
rounded at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from ..functions.portable import (
    portable_hash64,
    portable_hash64_sql,
    portable_unit_uniform,
    portable_unit_uniform_sql,
)
from .catalog import register, table

# ---------------------------------------------------------------------------
# Good-Turing frequency smoothing at bigram grain
# ---------------------------------------------------------------------------

_GT_MAX_ROWS = 15


@register(
    "good_turing_bigram_smoothing",
    f"""
    WITH toks AS (
        SELECT string_split(lower(text), ' ') AS ws FROM documents
        WHERE len(string_split(lower(text), ' ')) >= 2
    ),
    bi AS (
        SELECT w1 || ' ' || w2 AS g, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT ws[i] AS w1, ws[i + 1] AS w2
              FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
                    FROM toks))
        GROUP BY 1
    ),
    fof AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r FROM bi GROUP BY 1),
    tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT) AS n1
            FROM fof),
    nbr AS (
        SELECT r, n_r,
               COALESCE(lag(r) OVER (ORDER BY r), 0) AS q,
               lead(r) OVER (ORDER BY r) AS t,
               lead(r) OVER (ORDER BY r) = r + 1 AS contiguous,
               lead(n_r) OVER (ORDER BY r) AS n_next
        FROM fof
    ),
    z AS (
        SELECT r, n_r, contiguous, n_next,
               CAST(n_r AS DOUBLE)
               / (CASE WHEN t IS NULL THEN CAST(r - q AS DOUBLE)
                       ELSE 0.5 * CAST(t - q AS DOUBLE) END) AS z_r
        FROM nbr
    ),
    pts AS (
        SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
               CAST(round(ln(z_r) * 1000000) AS BIGINT) AS y
        FROM z
    ),
    fit AS (
        SELECT CAST(
                   (CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
                    - sum(CAST(x AS HUGEINT)) * sum(CAST(y AS HUGEINT)))
                   AS DOUBLE)
               / CAST(
                   (CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
                    - sum(CAST(x AS HUGEINT)) * sum(CAST(x AS HUGEINT)))
                   AS DOUBLE) AS b
        FROM pts
    ),
    ranked AS (
        SELECT z.*, ROW_NUMBER() OVER (ORDER BY r) AS rn FROM z
    )
    SELECT r, n_r,
           round(z_r, 5) AS z_r,
           round(CASE WHEN contiguous
                      THEN CAST(r + 1 AS DOUBLE) * n_next / n_r END, 5)
               AS r_star_turing,
           round(CAST(r AS DOUBLE)
                 * exp((fit.b + 1.0)
                       * ln(CAST(r + 1 AS DOUBLE) / CAST(r AS DOUBLE))), 5)
               AS r_star_lgt,
           round(fit.b, 5) AS lgt_slope,
           round(CAST(tot.n1 AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE), 6)
               AS p_unseen
    FROM ranked CROSS JOIN fit CROSS JOIN tot
    WHERE rn <= {_GT_MAX_ROWS}
    """,
    tags=("X-good-turing",),
)
def good_turing_bigram_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing count re-estimation at bigram grain (Good 1953): the
    adjusted count r* = (r+1) N_{r+1}/N_r and the unseen-event mass
    p0 = N_1/N, plus the Gale & Sampson 1995 "Simple Good-Turing"
    machinery the raw estimator needs on real data — this corpus's
    frequency-of-frequencies is GAPPY (N_5..N_14 = 0), so the raw
    Turing estimate is undefined exactly where the smoothing matters.
    Z_r = N_r / (0.5 (t - q)) spreads each N_r over its empty
    neighborhood (q, t = neighbor non-zero frequencies; r - q at the
    top rank), a log-log OLS fits ln Z = a + b ln r, and the
    linear-Good-Turing estimate r*_LGT = r (1 + 1/r)^(b+1) is defined
    everywhere. Emits the first {_GT_MAX_ROWS} frequency rows with both
    estimators side by side (r*_turing NULL where N_{{r+1}} = 0 — the
    honest gap) and the constant slope / unseen-mass columns.

    Distributed shape: one bigram explode into a map-side-combined
    count, then EVERYTHING runs at the frequency-of-frequencies grain —
    tens of rows — with the OLS in micro-unit integer moments
    (heaps_law precedent) summed as HUGEINT/decimal. The lag/lead
    windows run on that same tiny grid."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    toks = docs.select(ws.alias("ws")).filter(F.size("ws") >= 2)
    bi = (
        toks.select(
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
    fof = truncate_lineage(
        bi.groupBy(F.col("c").alias("r")).agg(F.count("*").cast("long").alias("n_r")),
        eager=False,
    )
    tot = fof.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("r") == 1, F.col("n_r")).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    w = Window.orderBy("r")
    nbr = fof.select(
        "r",
        "n_r",
        F.coalesce(F.lag("r").over(w), F.lit(0)).alias("q"),
        F.lead("r").over(w).alias("t"),
        (F.lead("r").over(w) == F.col("r") + 1).alias("contiguous"),
        F.lead("n_r").over(w).alias("n_next"),
    )
    z_r = F.col("n_r").cast("double") / F.when(
        F.col("t").isNull(), (F.col("r") - F.col("q")).cast("double")
    ).otherwise(0.5 * (F.col("t") - F.col("q")).cast("double"))
    z = truncate_lineage(
        nbr.select("r", "n_r", "contiguous", "n_next", z_r.alias("z_r")), eager=False
    )
    pts = z.select(
        F.round(F.log(F.col("r").cast("double")) * 1000000, 0).cast("long").alias("x"),
        F.round(F.log("z_r") * 1000000, 0).cast("long").alias("y"),
    )
    dx = F.col("x").cast("decimal(38,0)")
    fit = pts.agg(
        (
            (
                F.count("*").cast("decimal(38,0)") * F.sum(dx * F.col("y"))
                - F.sum(dx) * F.sum(F.col("y").cast("decimal(38,0)"))
            ).cast("double")
            / (
                F.count("*").cast("decimal(38,0)") * F.sum(dx * F.col("x"))
                - F.sum(dx) * F.sum(dx)
            ).cast("double")
        ).alias("b")
    )
    ranked = z.withColumn("rn", F.row_number().over(Window.orderBy("r"))).filter(
        F.col("rn") <= _GT_MAX_ROWS
    )
    return (
        ranked.crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            F.round("z_r", 5).alias("z_r"),
            F.round(
                F.when(
                    F.col("contiguous"),
                    (F.col("r") + 1).cast("double")
                    * F.col("n_next")
                    / F.col("n_r"),
                ),
                5,
            ).alias("r_star_turing"),
            F.round(
                F.col("r").cast("double")
                * F.exp(
                    (F.col("b") + 1.0)
                    * F.log((F.col("r") + 1).cast("double") / F.col("r").cast("double"))
                ),
                5,
            ).alias("r_star_lgt"),
            F.round(F.col("b"), 5).alias("lgt_slope"),
            F.round(
                F.col("n1").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("p_unseen"),
        )
    )


# ---------------------------------------------------------------------------
# Differentially-private noisy histogram (Laplace mechanism)
# ---------------------------------------------------------------------------

_DP_EPS = 1.0


@register(
    "dp_noisy_histogram",
    f"""
    WITH counts AS (
        SELECT source, CAST(count(*) AS BIGINT) AS true_count
        FROM documents GROUP BY 1
    ),
    noised AS (
        SELECT source, true_count,
               {portable_unit_uniform_sql("'dp:' || source")} AS u
        FROM counts
    )
    SELECT source, true_count,
           round(-(1.0 / {_DP_EPS}) * sign(u - 0.5)
                 * ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS laplace_noise,
           round(true_count - (1.0 / {_DP_EPS}) * sign(u - 0.5)
                 * ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS noisy_count,
           CAST({_DP_EPS} AS DOUBLE) AS epsilon
    FROM noised
    """,
    tags=("X-dp-laplace",),
)
def dp_noisy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private per-source document counts via the Laplace
    mechanism (Dwork, McSherry, Nissim & Smith 2006): a count query has
    L1-sensitivity 1, so adding Lap(1/epsilon) noise gives
    epsilon-DP. The noise is drawn by inverse-CDF from the portable
    deterministic uniform (hash of the bucket key), so the release
    replays identically on both engines and across retries — the same
    seeding discipline every randomized operator in this catalog uses.
    Completes the privacy-audit suite (k_anonymity_audit,
    l_diversity_audit, t_closeness_audit) with the mechanism half:
    those measure re-identification risk, this one shows the standard
    mitigation. true_count is emitted for audit parity here; a real
    release drops it.

    Distributed shape: one map-side-combined count per source, then
    pure per-row column math — no additional shuffle, no data-grain
    work beyond the aggregation."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").cast("long").alias("true_count"))
    u = portable_unit_uniform(F.concat(F.lit("dp:"), F.col("source")))
    noise = (
        -(1.0 / _DP_EPS)
        * F.signum(u - 0.5)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    return counts.select(
        "source",
        "true_count",
        F.round(noise, 4).alias("laplace_noise"),
        F.round(F.col("true_count") + noise, 4).alias("noisy_count"),
        F.lit(float(_DP_EPS)).alias("epsilon"),
    )


# ---------------------------------------------------------------------------
# Burrows' Delta stylometry between sources
# ---------------------------------------------------------------------------

_DELTA_TOPW = 30


@register(
    "stylometry_burrows_delta",
    f"""
    WITH tok AS (
        SELECT source, tok
        FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
    ),
    topw AS (
        SELECT tok FROM (
            SELECT tok, ROW_NUMBER() OVER (ORDER BY count(*) DESC, tok) AS rn
            FROM tok GROUP BY tok
        ) WHERE rn <= {_DELTA_TOPW}
    ),
    src_tot AS (SELECT source, CAST(count(*) AS BIGINT) AS nt FROM tok GROUP BY 1),
    cnt AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        FROM tok WHERE tok IN (SELECT tok FROM topw) GROUP BY 1, 2
    ),
    dense AS (
        SELECT s.source, t.tok,
               CAST(round(CAST(COALESCE(c.c, 0) AS DOUBLE) * 1000000000
                          / s.nt) AS BIGINT) AS r
        FROM src_tot s CROSS JOIN topw t
        LEFT JOIN cnt c ON c.source = s.source AND c.tok = t.tok
    ),
    stats AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS s,
               sum(CAST(r AS HUGEINT)) AS sr,
               sum(CAST(r AS HUGEINT) * r) AS srr
        FROM dense GROUP BY 1
    ),
    zs AS (
        SELECT d.source, d.tok,
               CAST(round((CAST(d.r AS DOUBLE)
                           - CAST(st.sr AS DOUBLE) / st.s) * 1000000
                          / sqrt(CAST(st.s * srr - sr * sr AS DOUBLE)
                                 / CAST(st.s * (st.s - 1) AS BIGINT)))
                    AS BIGINT) AS z
        FROM dense d JOIN stats st USING (tok)
        WHERE st.s * srr > sr * sr
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_words,
           round(CAST(sum(abs(CAST(a.z AS HUGEINT) - b.z)) AS DOUBLE)
                 / (count(*) * 1000000.0), 4) AS burrows_delta
    FROM zs a JOIN zs b ON a.tok = b.tok AND a.source < b.source
    GROUP BY 1, 2
    """,
    tags=("X-stylometry",),
)
def stylometry_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta (Burrows 2002): the mean absolute difference of
    per-source z-scored relative frequencies over the top-{_DELTA_TOPW}
    corpus words — the standard stylometric distance for authorship and
    register comparison, used here as a SOURCE-similarity audit: two
    crawl sources with near-zero delta are stylistic clones (template
    farms, mirrors) even when document-level dedup finds nothing.

    The rate matrix is DENSE by construction (source x top-word cross
    join with zero-fill) because a missing word is a strong stylistic
    signal, not missing data. Rates are parts-per-billion integers;
    the per-word mean/std use HUGEINT/decimal moment sums; the z-scores
    become micro-unit integers BEFORE the pairwise |z_a - z_b| sum, so
    the delta aggregation is exact integer arithmetic (fixed-point
    discipline). Words with zero cross-source variance are excluded by
    the integer predicate s*srr > sr*sr — the z-score is undefined
    there on both engines alike.

    Distributed shape: one token explode feeding two map-side-combined
    aggregations (source totals, per-source-word counts of the top-w
    list only); everything after runs at the (sources x {_DELTA_TOPW})
    grid grain, with the pairwise join a (S^2 x words) grid — constant
    in corpus size."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    tok = truncate_lineage(tok, eager=False)
    topw = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("cc"))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc("cc"), "tok")))
        .filter(F.col("rn") <= _DELTA_TOPW)
        .select("tok")
    )
    src_tot = tok.groupBy("source").agg(F.count("*").cast("long").alias("nt"))
    cnt = (
        tok.join(F.broadcast(topw), "tok")
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    dense = (
        src_tot.crossJoin(F.broadcast(topw))
        .join(cnt, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            F.round(
                F.coalesce("c", F.lit(0)).cast("double") * 1000000000 / F.col("nt"), 0
            )
            .cast("long")
            .alias("r"),
        )
    )
    dense = truncate_lineage(dense, eager=False)
    dr = F.col("r").cast("decimal(38,0)")
    stats = dense.groupBy("tok").agg(
        F.count("*").cast("long").alias("s"),
        F.sum(dr).alias("sr"),
        F.sum(dr * F.col("r")).alias("srr"),
    )
    var_num = (F.col("s") * F.col("srr") - F.col("sr") * F.col("sr")).cast("double")
    std = F.sqrt(var_num / (F.col("s") * (F.col("s") - 1)).cast("double"))
    zs = (
        dense.join(F.broadcast(stats), "tok")
        .filter(F.col("s") * F.col("srr") > F.col("sr") * F.col("sr"))
        .select(
            "source",
            "tok",
            F.round(
                (F.col("r").cast("double") - F.col("sr").cast("double") / F.col("s"))
                * 1000000
                / std,
                0,
            )
            .cast("long")
            .alias("z"),
        )
    )
    a, b = zs.alias("a"), zs.alias("b")
    return (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.round(
                F.sum(F.abs(F.col("a.z") - F.col("b.z")).cast("decimal(38,0)")).cast(
                    "double"
                )
                / (F.count("*") * 1000000.0),
                4,
            ).alias("burrows_delta"),
        )
    )


# ---------------------------------------------------------------------------
# Sparse TF-IDF cosine near-duplicate pairs over shingle postings
# ---------------------------------------------------------------------------

_SC_THRESHOLD = 0.5
_SC_MAX_DF = 100  # drop boilerplate terms; no-op at test scale, load-bearing at 100 TB


@register(
    "sparse_cosine_neardup_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
        WHERE len(string_split(lower(text), ' ')) >= 3
    ),
    tri AS (
        SELECT doc_id, g, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id,
                     ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS g
              FROM (SELECT doc_id, ws,
                           unnest(generate_series(1, len(ws) - 2)) AS i
                    FROM toks))
        GROUP BY 1, 2
    ),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tri),
    df AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM tri GROUP BY 1),
    w AS (
        SELECT t.doc_id, {portable_hash64_sql("t.g")} AS k,
               t.tf * CAST(round(ln(CAST(n.n AS DOUBLE) / df.df) * 1000)
                           AS BIGINT) AS w
        FROM tri t JOIN df USING (g) CROSS JOIN n
        WHERE df.df BETWEEN 2 AND {_SC_MAX_DF}
    ),
    nrm AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2 FROM w GROUP BY 1),
    wn AS (SELECT w.doc_id, w.k, w.w, nrm.n2 FROM w JOIN nrm USING (doc_id)),
    dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(sum(a.w * b.w) AS BIGINT) AS dot,
               CAST(count(*) AS BIGINT) AS shared_terms,
               min(a.n2) AS na, min(b.n2) AS nb
        FROM wn a JOIN wn b ON a.k = b.k AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, shared_terms,
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))),
                 4) AS cosine
    FROM dots
    WHERE CAST(dot AS DOUBLE)
          / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
          >= {_SC_THRESHOLD}
    """,
    tags=("X-sparse-cosine",),
)
def sparse_cosine_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine near-duplicate detection over 3-gram shingle
    postings — the WEIGHTED complement of the unweighted shingle-Jaccard
    family (dedup_ngram_jaccard, prefix_filter_jaccard_join): two
    documents sharing rare shingles score far higher than two sharing
    boilerplate, which Jaccard cannot express. Candidate pairs come from
    a posting-list SELF-JOIN on the shingle key (Bayardo et al. 2007's
    inverted-index approach): only documents sharing at least one
    indexed term ever meet, and the df <= {_SC_MAX_DF} cap drops
    boilerplate terms whose postings would dominate the join — a no-op
    on this corpus, the load-bearing prune at 100 TB (df-heavy terms
    contribute near-zero idf weight anyway). df = 1 terms are excluded
    too: they cannot form a pair.

    idf values are MILLI-unit integers — small enough that w*w and the
    dot/norm sums stay far inside int64 (w <= tf * ln(N/2)*10^3 ~ 10^5,
    products ~ 10^10, sums over <= 10^4-shingle docs ~ 10^14) with no
    decimal aggregation in the hot pair loop (the A/B against
    micro-unit+decimal sums: 1.49 -> 0.96 s warm at sf0.1), and the
    cosine is one double division over two IEEE-exact sqrts, rounded at
    the edge — no float accumulation order anywhere. The pairing key is
    the 60-bit portable md5 hash of the shingle, not the string — an
    8-byte shuffle key instead of ~25-byte text (A/B 1.03 -> 0.68 s
    warm), identical on both engines by the shared-hash-family rule so
    a collision (p ~ terms^2 / 2^61) would produce the same pair on
    both sides.

    r14 (guide §2.3/§3.1/§4.2, the simhash_hamming_pairs pattern):
    candidate pairs are KEY-LOCAL — a shingle's posting list already
    holds every pair it can produce (max 25 postings/key at sf1) — so
    the posting SELF-JOIN (a BroadcastHashJoin that rebuilt and shipped
    the full 2.6M-row posting relation every run, a linearly-growing
    broadcast that is exactly guide §3.1's failure mode at corpus
    scale) is replaced by ONE hash exchange of the narrow (doc_id, k,
    w) postings and vectorized numpy pair generation inside a
    mapInPandas: runs of equal key are paired with per-run-length
    triu_indices batches, products are int64-exact, and only (doc_a,
    doc_b, w_a*w_b) rows reach the pair aggregation. The per-document
    norm no longer rides on every posting/pair row (it was 16 of every
    48 exchange bytes for the ~11.3M-pair exchange at sf1 — near-zero
    combining, mean shared_terms ~ 1.12); norms broadcast-join back
    onto the aggregated pair frame (47K-row broadcasts) before the
    threshold filter. Same output bit-for-bit: integer products summed
    in any order, strict doc_a < doc_b reproduced by the within-run
    id sort + da != db mask (covering hash-collision duplicates
    exactly like the join's inequality did). Distributed shape: one
    shingle explode, two map-side-combined aggregations (df, norms),
    one posting exchange on uniform hashed keys, pair generation
    key-local, one pair-grain aggregation."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..operators.fanout import fan_out

    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    # fan_out BEFORE the shingle explode (shingle_frame precedent): the
    # small parquet is one input partition and trigram construction is
    # the CPU-heavy step — A/B 5.2 -> 1.5 s cold at sf0.1.
    toks = fan_out(docs).select("doc_id", ws.alias("ws")).filter(F.size("ws") >= 3)
    tri = (
        toks.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 2),
                    F.zip_with(
                        F.slice(F.col("ws"), 2, F.size("ws") - 2),
                        F.slice(F.col("ws"), 3, F.size("ws") - 2),
                        lambda b, c: F.concat(b, F.lit(" "), c),
                    ),
                    lambda a, bc: F.concat(a, F.lit(" "), bc),
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    tri = truncate_lineage(tri, eager=False)
    n = tri.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    df = tri.groupBy("g").agg(F.count("*").cast("long").alias("df"))
    w = (
        tri.join(df, "g")
        .crossJoin(F.broadcast(n))
        .filter((F.col("df") >= 2) & (F.col("df") <= _SC_MAX_DF))
        .select(
            "doc_id",
            portable_hash64(F.col("g")).alias("k"),
            (
                F.col("tf")
                * F.round(
                    F.log(F.col("n").cast("double") / F.col("df")) * 1000, 0
                ).cast("long")
            ).alias("w"),
        )
    )
    # Narrow checkpoint: (doc_id, k, w) only — norms are derived FROM the
    # checkpoint (one 2.6M->47K aggregation, consumed twice as tiny
    # broadcasts) instead of riding every posting and pair row.
    w = truncate_lineage(w, eager=False)
    nrm = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("n2")
    )

    def pairgen(batches):
        # Pair every run of equal k: postings sort by (k, doc_id), runs
        # group by length, and each length-L cohort pairs with one
        # triu_indices(L, 1) batch — no per-key Python loop. max
        # postings/key is df-capped at _SC_MAX_DF, so L is bounded.
        ks: list = []
        ids: list = []
        wv: list = []
        for pdf in batches:
            if len(pdf):
                ks.append(pdf["k"].to_numpy(np.int64))
                ids.append(pdf["doc_id"].to_numpy(np.int64))
                wv.append(pdf["w"].to_numpy(np.int64))
        if not ks:
            return
        k = np.concatenate(ks)
        did = np.concatenate(ids)
        wgt = np.concatenate(wv)
        order = np.lexsort((did, k))
        k, did, wgt = k[order], did[order], wgt[order]
        bnd = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        lens = np.diff(np.r_[bnd, len(k)])
        out_a: list = []
        out_b: list = []
        out_p: list = []
        for run_len in np.unique(lens):
            if run_len < 2:
                continue
            starts = bnd[lens == run_len]
            iu, ju = np.triu_indices(int(run_len), 1)
            ia = (starts[:, None] + iu[None, :]).ravel()
            ib = (starts[:, None] + ju[None, :]).ravel()
            out_a.append(did[ia])
            out_b.append(did[ib])
            out_p.append(wgt[ia] * wgt[ib])
        if not out_a:
            return
        da = np.concatenate(out_a)
        db = np.concatenate(out_b)
        pr = np.concatenate(out_p)
        # strict doc_a < doc_b, exactly like the join's inequality: ids
        # sort ascending within a run, so only collision-duplicate rows
        # of the SAME doc can pair equal — drop them.
        good = da != db
        da, db, pr = da[good], db[good], pr[good]
        chunk = 2_000_000  # bound the per-yield Arrow frame
        for s in range(0, len(da), chunk):
            yield pd.DataFrame(
                {
                    "doc_a": da[s : s + chunk],
                    "doc_b": db[s : s + chunk],
                    "p": pr[s : s + chunk],
                }
            )

    pair_schema = T.StructType(
        [
            T.StructField("doc_a", T.LongType()),
            T.StructField("doc_b", T.LongType()),
            T.StructField("p", T.LongType()),
        ]
    )
    # Explicit-N keyed repartition (defaultParallelism, the repo's
    # scale-adaptive hedge): a plain repartition("k") would let AQE
    # coalesce the ~62 MB posting exchange to 1-2 tasks and serialize
    # the CPU-heavy pair map behind it.
    prods = w.repartition(
        spark.sparkContext.defaultParallelism, "k"
    ).mapInPandas(pairgen, pair_schema)
    dots = prods.groupBy("doc_a", "doc_b").agg(
        F.sum("p").cast("long").alias("dot"),
        F.count("*").cast("long").alias("shared_terms"),
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb"))
    dots = dots.join(F.broadcast(na), "doc_a").join(F.broadcast(nb), "doc_b")
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        dots.filter(cos >= _SC_THRESHOLD)
        .select("doc_a", "doc_b", "shared_terms", F.round(cos, 4).alias("cosine"))
    )
