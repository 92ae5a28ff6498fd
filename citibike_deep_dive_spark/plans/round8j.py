"""Round-8 continuation batch 8 (final): bipartite centrality and
importance-sampling diagnostics — HITS hubs and authorities (Kleinberg
1999) on the document-term bipartite graph, the second member of the
iterative-centrality family next to dedup_pagerank_hubs (pagerank ranks
within ONE node set; HITS ranks both sides of a bipartite structure —
authoritative terms and hub documents reinforce each other), and the
effective sample size of the DSIR importance weights (Kong 1992's
ESS = (sum w)^2 / sum w^2), the standard diagnostic for whether an
importance-weighted corpus resample actually carries the nominal
sample's information or collapses onto a few dominant documents.

Engine-exactness: HITS runs UNNORMALIZED for a fixed 3 half-steps so
every score is exact integer arithmetic (normalization only fights
overflow; decimal(38,0)/HUGEINT accumulation removes the need) with the
ratio-to-max taken once at the edge; ESS converts each weight to a
micro-unit integer before the decimal-exact power sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table

# ---------------------------------------------------------------------------
# HITS on the document-term bipartite graph (Kleinberg 1999)
# ---------------------------------------------------------------------------

_HITS_TOPK = 10


@register(
    "hits_doc_term_bipartite",
    f"""
    WITH edges AS (
        SELECT DISTINCT doc_id, tok
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
    ),
    a1 AS (  -- authority_1(t) = sum of initial hub 1 over docs containing t
        SELECT tok, CAST(count(*) AS HUGEINT) AS a FROM edges GROUP BY 1
    ),
    h1 AS (  -- hub_1(d) = sum of authority_1 over d's terms
        SELECT e.doc_id, sum(a1.a) AS h
        FROM edges e JOIN a1 USING (tok) GROUP BY 1
    ),
    a2 AS (  -- authority_2(t) = sum of hub_1 over docs containing t
        SELECT e.tok, sum(h1.h) AS a
        FROM edges e JOIN h1 USING (doc_id) GROUP BY 1
    ),
    amax AS (SELECT max(a) AS m FROM a2),
    hmax AS (SELECT max(h) AS m FROM h1),
    auth AS (
        SELECT 'authority' AS kind, tok AS node,
               CAST(a AS BIGINT) AS score,
               round(CAST(a AS DOUBLE) / CAST(amax.m AS DOUBLE), 6) AS score_ratio,
               ROW_NUMBER() OVER (ORDER BY a DESC, tok) AS rn
        FROM a2 CROSS JOIN amax
    ),
    hubs AS (
        SELECT 'hub' AS kind, CAST(doc_id AS VARCHAR) AS node,
               CAST(h AS BIGINT) AS score,
               round(CAST(h AS DOUBLE) / CAST(hmax.m AS DOUBLE), 6) AS score_ratio,
               ROW_NUMBER() OVER (ORDER BY h DESC, doc_id) AS rn
        FROM h1 CROSS JOIN hmax
    )
    SELECT kind, node, score, score_ratio FROM auth WHERE rn <= {_HITS_TOPK}
    UNION ALL
    SELECT kind, node, score, score_ratio FROM hubs WHERE rn <= {_HITS_TOPK}
    """,
    tags=("X-hits",),
)
def hits_doc_term_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) on the document-term bipartite graph, run
    UNNORMALIZED for a fixed 3 half-steps (authority <- hubs <-
    authority): with all hubs initialized to 1, authority_1 is document
    frequency, hub_1 scores documents by the total df of their terms,
    and authority_2 re-scores terms by the hubbiness of the documents
    containing them — terms that co-occur inside term-rich documents
    outrank merely-frequent ones, which is exactly the signal raw df
    (corpus_top_ngrams) cannot see. The second iterative-centrality
    member next to dedup_pagerank_hubs: pagerank ranks one node set by
    random-walk mass; HITS ranks BOTH sides of a bipartite structure.

    Normalization exists in HITS only to stop value growth; a fixed
    unrolled depth with HUGEINT/decimal integer sums does not need it,
    so every score is EXACT integer arithmetic and the ratio-to-max is
    one division at the edge (the integer-exactness discipline the
    pagerank oracle had to approximate with rounded doubles).
    Distributed shape: one distinct (doc, term) edge frame, three
    edge-keyed aggregation/join rounds — each a shuffle on the edge
    key, the bipartite power-iteration shape — then two top-{_HITS_TOPK}
    windows."""
    docs = table(spark, sf_dir, "documents")
    edges = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .distinct()
    )
    edges = truncate_lineage(edges, eager=False)
    a1 = edges.groupBy("tok").agg(F.count("*").cast("decimal(38,0)").alias("a"))
    h1 = (
        edges.join(a1, "tok")
        .groupBy("doc_id")
        .agg(F.sum("a").alias("h"))
    )
    h1 = truncate_lineage(h1, eager=False)
    a2 = (
        edges.join(h1, "doc_id")
        .groupBy("tok")
        .agg(F.sum("h").alias("a"))
    )
    amax = a2.agg(F.max("a").alias("am"))
    hmax = h1.agg(F.max("h").alias("hm"))
    auth = (
        a2.crossJoin(F.broadcast(amax))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc("a"), "tok")))
        .filter(F.col("rn") <= _HITS_TOPK)
        .select(
            F.lit("authority").alias("kind"),
            F.col("tok").alias("node"),
            F.col("a").cast("long").alias("score"),
            F.round(F.col("a").cast("double") / F.col("am").cast("double"), 6).alias(
                "score_ratio"
            ),
        )
    )
    hubs = (
        h1.crossJoin(F.broadcast(hmax))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc("h"), "doc_id")))
        .filter(F.col("rn") <= _HITS_TOPK)
        .select(
            F.lit("hub").alias("kind"),
            F.col("doc_id").cast("string").alias("node"),
            F.col("h").cast("long").alias("score"),
            F.round(F.col("h").cast("double") / F.col("hm").cast("double"), 6).alias(
                "score_ratio"
            ),
        )
    )
    return auth.unionByName(hubs)


# ---------------------------------------------------------------------------
# Effective sample size of the DSIR importance weights (Kong 1992)
# ---------------------------------------------------------------------------


def _ess_oracle() -> str:
    # the weights chain mirrors dsir_importance_weights' oracle
    # (round8.py) — same bucket hash, same +1 smoothing, same 5dp edge
    from ..functions.portable import portable_hash64_sql
    from .round8 import _DSIR_BUCKETS, _DSIR_TARGET

    bucket = portable_hash64_sql("ws[i] || ' ' || ws[i + 1]")
    return f"""
    WITH toks AS (
        SELECT doc_id, source = '{_DSIR_TARGET}' AS is_target,
               string_split(lower(text), ' ') AS ws
        FROM documents
    ),
    grams AS (
        SELECT doc_id, is_target, {bucket} % {_DSIR_BUCKETS} AS bucket
        FROM (SELECT doc_id, is_target, ws,
                     unnest(generate_series(1, len(ws) - 1)) AS i
              FROM toks WHERE len(ws) >= 2)
    ),
    bg AS (
        SELECT doc_id, is_target, bucket, count(*) AS c
        FROM grams GROUP BY 1, 2, 3
    ),
    totals AS (
        SELECT bucket,
               sum(CASE WHEN is_target THEN c ELSE 0 END) AS tc,
               sum(c) AS rc
        FROM bg GROUP BY 1
    ),
    scalars AS (
        SELECT CAST(sum(tc) AS DOUBLE) AS t_tot,
               CAST(sum(rc) AS DOUBLE) AS r_tot
        FROM totals
    ),
    ratios AS (
        SELECT bucket,
               ln((tc + 1.0) / (t_tot + {_DSIR_BUCKETS}))
             - ln((rc + 1.0) / (r_tot + {_DSIR_BUCKETS})) AS lr
        FROM totals CROSS JOIN scalars
    ),
    weights AS (
        SELECT bg.doc_id, round(sum(bg.c * r.lr), 5) AS dsir_logw
        FROM bg JOIN ratios r ON bg.bucket = r.bucket
        GROUP BY bg.doc_id
    ),
    w AS (
        SELECT d.source,
               CAST(round(exp(lw.dsir_logw) * 1000000) AS BIGINT) AS w_mu
        FROM weights lw
        JOIN documents d USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(w_mu AS HUGEINT)) * sum(CAST(w_mu AS HUGEINT))
                      AS DOUBLE)
                 / CAST(sum(CAST(w_mu AS HUGEINT) * w_mu) AS DOUBLE), 2) AS ess,
           round(CAST(sum(CAST(w_mu AS HUGEINT)) * sum(CAST(w_mu AS HUGEINT))
                      AS DOUBLE)
                 / CAST(sum(CAST(w_mu AS HUGEINT) * w_mu) AS DOUBLE)
                 / count(*), 4) AS ess_fraction,
           round(CAST(max(w_mu) AS DOUBLE)
                 / CAST(sum(CAST(w_mu AS HUGEINT)) AS DOUBLE), 4) AS max_weight_share
    FROM w GROUP BY 1
    """


@register("importance_weight_ess", _ess_oracle(), tags=("X-ess",))
def importance_weight_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the DSIR importance weights per source
    (Kong 1992; the diagnostic every importance-sampling pipeline
    checks before trusting a resample): ESS = (sum w)^2 / sum w^2, in
    [1, n] — n when weights are uniform, 1 when one document carries all
    the mass. A source whose ESS fraction collapses toward 0 would be
    resampled into near-duplicates of its few highest-weight documents
    (dsir_importance_resample draws exactly these weights), so this is
    the go/no-go gate in front of that query; max_weight_share names the
    dominance directly.

    Weights become micro-unit INTEGERS (exp of the driver-green 5dp
    log-weights — identical doubles on both engines — then one rounding)
    before the power sums, which accumulate as HUGEINT/decimal so w^2
    never overflows; ESS is a ratio of exact integers. One weight join,
    one source-grain aggregation."""
    from .round8 import dsir_doc_buckets, dsir_model, dsir_weights

    docs = table(spark, sf_dir, "documents")
    bg = dsir_doc_buckets(docs)
    lw = dsir_weights(bg, dsir_model(bg))
    # r14 checkpoint audit: w feeds exactly ONE aggregation — the
    # checkpoint was a doc-grain write+read inside a single execution
    # (it only ever subsidized warm re-runs of the same df), dropped.
    w = lw.join(docs.select("doc_id", "source"), "doc_id").select(
        "source",
        F.round(F.exp("dsir_logw") * 1000000, 0).cast("long").alias("w_mu"),
    )
    dw = F.col("w_mu").cast("decimal(38,0)")
    agg = w.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(dw).alias("sw"),
        F.sum(dw * F.col("w_mu")).alias("sww"),
        F.max("w_mu").alias("mw"),
    )
    ess = (F.col("sw") * F.col("sw")).cast("double") / F.col("sww").cast("double")
    return agg.select(
        "source",
        "n_docs",
        F.round(ess, 2).alias("ess"),
        F.round(ess / F.col("n_docs"), 4).alias("ess_fraction"),
        F.round(F.col("mw").cast("double") / F.col("sw").cast("double"), 4).alias(
            "max_weight_share"
        ),
    )
