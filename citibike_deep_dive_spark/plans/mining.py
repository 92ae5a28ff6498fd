"""Round-8 late additions: corpus-mining / data-selection methods from
the published training-data literature that were still missing from the
catalog — robust winnowing fingerprints (Schleimer et al. 2003, the MOSS
algorithm), margin-based bitext mining (Artetxe & Schwenk 2019),
prototype-distance hard-example pruning (Sorscher et al. 2022, "Beyond
neural scaling laws"), token-budget water-filling under epoch caps
(the allocation problem of Muennighoff et al. 2023, "Scaling
data-constrained language models"), and embedding-space eval-set
decontamination (the semantic complement of
``decontamination_ngram_overlap``).

Every query follows the catalog determinism rules (catalog.py module
docstring): identical aliases on both engines, explicit tiebreaks on
every ranking, rounding at the edge only, integer-packed argmax where a
"max value, tie min id" is needed (winning-pattern 11), and the shared
md5 hash family (functions/portable.py) wherever a bucket id must match
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from ..operators.fanout import fan_out
from .catalog import register, table

# ---------------------------------------------------------------------------
# Robust winnowing (Schleimer, Wilkerson & Aiken 2003)
# ---------------------------------------------------------------------------

_WIN_K = 4  # words per k-gram
_WIN_W = 5  # winnowing window (guarantee: any match >= w+k-1 words shares a print)
_WIN_HMOD = 1 << 20  # hash range; pack = hash * 2^20 + (2^20-1 - pos) < 2^40


@register(
    "winnowing_fingerprints",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws
        FROM documents
        WHERE len(string_split(lower(text), ' ')) >= {_WIN_K + _WIN_W - 1}
    ),
    grams AS (
        SELECT doc_id,
               list_transform(generate_series(1, len(ws) - {_WIN_K - 1}), i ->
                   ('0x' || substr(md5(array_to_string(
                       list_transform(generate_series(i, i + {_WIN_K - 1}), j -> ws[j]),
                       ' ')), 1, 15))::BIGINT % {_WIN_HMOD}) AS gh
        FROM toks
    ),
    packs AS (
        SELECT doc_id, len(gh) AS n_grams,
               list_transform(generate_series(1, len(gh) - {_WIN_W - 1}), i ->
                   list_min(list_transform(generate_series(i, i + {_WIN_W - 1}), j ->
                       gh[j] * {_WIN_HMOD} + ({_WIN_HMOD - 1} - j)))) AS sel
        FROM grams
    )
    SELECT doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(len(sel) AS BIGINT) AS n_windows,
           CAST(len(list_distinct(sel)) AS BIGINT) AS n_fingerprints,
           CAST(len(list_distinct(list_transform(sel, p -> p // {_WIN_HMOD})))
                AS BIGINT) AS n_distinct_hashes,
           round(CAST(len(list_distinct(sel)) AS DOUBLE)
                 / CAST(len(sel) AS DOUBLE), 4) AS fingerprint_density
    FROM packs
    """,
    tags=("X-winnowing",),
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust winnowing (Schleimer et al. 2003 §4): hash every
    overlapping k-gram, slide a w-hash window, and select each window's
    minimum hash — rightmost occurrence on ties, which is exactly what
    the integer pack ``hash * 2^20 + (2^20-1 - pos)`` turns into a plain
    ``array_min`` (winning-pattern 11; no struct compare, no per-window
    sort). The guarantee: any two documents sharing a run of at least
    w + k - 1 words share at least one selected fingerprint, with
    expected density 2/(w+1) — the fingerprint sets feed a MOSS-style
    plagiarism/near-dup index at ~1/3 the k-gram volume.

    Distributed shape: pure narrow codegen — one scan, zero shuffles;
    every per-doc step is nested higher-order functions over the split
    array (positions ride as index arithmetic, the
    phrase_search_positional lesson). At 100 TB this is the map side of
    a fingerprint-postings build; the selected (hash, doc) pairs would
    feed the same explode + groupBy as inverted_index_postings. Hash ids
    come from the portable md5 family so the oracle is engine-exact."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    ws = F.split(F.lower("text"), " ")
    k, w, hmod = _WIN_K, _WIN_W, _WIN_HMOD
    gh = F.expr(
        f"transform(sequence(1, size(ws) - {k - 1}), i -> "
        f"CAST(conv(substring(md5(array_join(slice(ws, i, {k}), ' ')), 1, 15), 16, 10)"
        f" AS BIGINT) % {hmod})"
    )
    sel = F.expr(
        f"transform(sequence(1, size(gh) - {w - 1}), i -> "
        f"array_min(transform(sequence(i, i + {w - 1}), j -> "
        f"element_at(gh, j) * {hmod}L + ({hmod - 1}L - j))))"
    )
    return (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= k + w - 1)
        .select("doc_id", gh.alias("gh"))
        .select("doc_id", F.size("gh").cast("long").alias("n_grams"), sel.alias("sel"))
        .select(
            "doc_id",
            "n_grams",
            F.size("sel").cast("long").alias("n_windows"),
            F.size(F.array_distinct("sel")).cast("long").alias("n_fingerprints"),
            F.size(
                F.array_distinct(F.expr(f"transform(sel, p -> p div {hmod})"))
            )
            .cast("long")
            .alias("n_distinct_hashes"),
            F.round(
                F.size(F.array_distinct("sel")).cast("double")
                / F.size("sel").cast("double"),
                4,
            ).alias("fingerprint_density"),
        )
    )


# ---------------------------------------------------------------------------
# Margin-based bitext mining (Artetxe & Schwenk 2019)
# ---------------------------------------------------------------------------

_MARGIN_K = 4  # neighborhood size for the margin denominator

_MINE_COS = """
    list_sum(list_transform(generate_series(1, len({a})),
        i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


@register(
    "margin_bitext_mining",
    f"""
    WITH x AS (SELECT vec_id AS src_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
    y AS (SELECT vec_id AS tgt_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
    p AS (
        SELECT src_id, tgt_id,
               CAST(round(({_MINE_COS.format(a="x.embedding", b="y.embedding")})
                    * 10000) AS BIGINT) AS cos_i
        FROM x CROSS JOIN y
    ),
    ranked AS (
        SELECT src_id, tgt_id, cos_i,
               ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY cos_i DESC, tgt_id) AS rn_s,
               ROW_NUMBER() OVER (PARTITION BY tgt_id ORDER BY cos_i DESC, src_id) AS rn_t
        FROM p
    ),
    denom AS (
        SELECT src_id, tgt_id, cos_i,
               sum(CASE WHEN rn_s <= {_MARGIN_K} THEN cos_i END)
                   OVER (PARTITION BY src_id) AS dx,
               sum(CASE WHEN rn_t <= {_MARGIN_K} THEN cos_i END)
                   OVER (PARTITION BY tgt_id) AS dy
        FROM ranked
    ),
    margins AS (
        SELECT src_id, tgt_id, cos_i,
               CAST(cos_i AS DOUBLE) * {2 * _MARGIN_K} / CAST(dx + dy AS DOUBLE)
                   AS margin,
               ROW_NUMBER() OVER (PARTITION BY src_id
                   ORDER BY CAST(cos_i AS DOUBLE) * {2 * _MARGIN_K}
                            / CAST(dx + dy AS DOUBLE) DESC, tgt_id) AS rm_s,
               ROW_NUMBER() OVER (PARTITION BY tgt_id
                   ORDER BY CAST(cos_i AS DOUBLE) * {2 * _MARGIN_K}
                            / CAST(dx + dy AS DOUBLE) DESC, src_id) AS rm_t
        FROM denom
    )
    SELECT src_id, tgt_id,
           round(CAST(cos_i AS DOUBLE) / 10000.0, 4) AS cos_sim,
           round(margin, 5) AS margin_score
    FROM margins WHERE rm_s = 1 AND rm_t = 1
    """,
    tags=("X-bitext-margin",),
)
def margin_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based parallel-corpus mining (Artetxe & Schwenk 2019 §3,
    the LASER/CCMatrix criterion): raw cosine over-selects hub vectors,
    so each candidate pair is scored by its RATIO margin — cos(x, y)
    normalized by the mean cosine of each side's k nearest neighbors in
    the OTHER side — and only mutual-best pairs by margin survive.
    margin(x, y) = cos(x, y) / ((avg_k NN_Y(x) + avg_k NN_X(y)) / 2),
    here as the integer-exact form cos_i * 2k / (dx + dy): cosines are
    scaled to 1e4 integers BEFORE the neighborhood sums, so every
    engine-order-sensitive aggregation in the pipeline is integer
    arithmetic and the only doubles are single IEEE divisions
    (engine-exact); id tiebreaks make both rankings total.

    Distributed shape: the even side scans once with the odd side
    broadcast (bitext corpora are per-language-pair shards — the smaller
    language broadcasts); the scored pair frame is lazily checkpointed
    because SIX window consumers (two ranks, two neighborhood sums, two
    margin ranks) would each rebuild the 64-term dot products (the
    multiply-consumed-frame rule). Windows group into one exchange per
    partition key. At 100 TB the cross join is replaced by an ANN
    shortlist (ann_ivfpq_rerank_exact) feeding the SAME margin/mutual
    plan — the normalization and mutual-best logic is shortlist-local."""
    emb = (
        fan_out(table(spark, sf_dir, "embeddings"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    dot = F.aggregate(
        F.zip_with("xv", "yv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda t: t * t), F.lit(0.0), lambda acc, v: acc + v
            )
        )

    x = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"), F.col("v").alias("xv")
    )
    y = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"), F.col("v").alias("yv")
    )
    cos_i = F.round(dot / (norm(F.col("xv")) * norm(F.col("yv"))) * 10000, 0).cast(
        "long"
    )
    pairs = truncate_lineage(
        x.crossJoin(F.broadcast(y)).select("src_id", "tgt_id", cos_i.alias("cos_i")),
        eager=False,
    )
    k = _MARGIN_K
    rn_s = F.row_number().over(
        Window.partitionBy("src_id").orderBy(F.desc("cos_i"), "tgt_id")
    )
    rn_t = F.row_number().over(
        Window.partitionBy("tgt_id").orderBy(F.desc("cos_i"), "src_id")
    )
    ranked = pairs.select("src_id", "tgt_id", "cos_i", rn_s.alias("rn_s"), rn_t.alias("rn_t"))
    dx = F.sum(F.when(F.col("rn_s") <= k, F.col("cos_i"))).over(
        Window.partitionBy("src_id")
    )
    dy = F.sum(F.when(F.col("rn_t") <= k, F.col("cos_i"))).over(
        Window.partitionBy("tgt_id")
    )
    denom = ranked.select("src_id", "tgt_id", "cos_i", dx.alias("dx"), dy.alias("dy"))
    margin = (
        F.col("cos_i").cast("double")
        * F.lit(2 * k)
        / (F.col("dx") + F.col("dy")).cast("double")
    )
    margins = denom.select("src_id", "tgt_id", "cos_i", margin.alias("margin"))
    rm_s = F.row_number().over(
        Window.partitionBy("src_id").orderBy(F.desc("margin"), "tgt_id")
    )
    rm_t = F.row_number().over(
        Window.partitionBy("tgt_id").orderBy(F.desc("margin"), "src_id")
    )
    return (
        margins.select("src_id", "tgt_id", "cos_i", "margin", rm_s.alias("rm_s"), rm_t.alias("rm_t"))
        .filter((F.col("rm_s") == 1) & (F.col("rm_t") == 1))
        .select(
            "src_id",
            "tgt_id",
            F.round(F.col("cos_i").cast("double") / 10000.0, 4).alias("cos_sim"),
            F.round("margin", 5).alias("margin_score"),
        )
    )


# ---------------------------------------------------------------------------
# Prototype-distance hard-example pruning (Sorscher et al. 2022)
# ---------------------------------------------------------------------------


@register(
    "prototype_hard_keep",
    """
    WITH c AS (
        SELECT vec_id AS cluster_id, embedding AS centroid
        FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
        SELECT e.vec_id, c.cluster_id,
               round(list_sum(list_transform(generate_series(1, len(e.embedding)),
                   i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.centroid[i] AS DOUBLE))
                      * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.centroid[i] AS DOUBLE)))), 6)
                   AS d2
        FROM embeddings e CROSS JOIN c
    ),
    assigned AS (
        SELECT vec_id, cluster_id, d2 FROM (
            SELECT vec_id, cluster_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster_id) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    ranked AS (
        SELECT vec_id, cluster_id, d2,
               ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY d2 DESC, vec_id)
                   AS hard_rank,
               count(*) OVER (PARTITION BY cluster_id) AS n_cluster
        FROM assigned
    )
    SELECT vec_id, CAST(cluster_id AS INT) AS cluster_id, d2 AS proto_dist,
           CAST(hard_rank AS BIGINT) AS hard_rank
    FROM ranked WHERE hard_rank <= (n_cluster + 1) // 2
    """,
    tags=("X-prototype-prune",),
)
def prototype_hard_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-supervised prototype pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws"): cluster the embedding space, score every
    example by its distance to its cluster prototype, and KEEP THE HARD
    HALF — the examples farthest from their prototype — because easy
    (prototypical) examples are the ones a data-constrained run can drop
    with the least loss. Same fixed centroids as
    ivf_fixed_centroid_assignment (vectors 0..7), squared-L2 rounded at
    6dp with cluster-id tiebreak for an engine-total argmin; the keep
    rule is the integer form hard_rank <= (n+1) div 2 so the cut is
    exact on both engines at any cluster size.

    Distributed shape: one corpus scan with the 8-row centroid frame
    broadcast, one exchange keyed by vec_id for the argmin window, one
    keyed by cluster for the rank-and-count window (both windows on one
    sort each). At 100 TB the centroids come from ivf_kmeans_cells and
    the per-cluster rank is exactly the WindowGroupLimit shape —
    per-cluster top-(n/2) pushes the cut below the exchange."""
    emb = fan_out(table(spark, sf_dir, "embeddings"))
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    v = F.col("embedding").cast("array<double>")
    d2 = F.aggregate(
        F.zip_with(v, F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    scored = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(centroids))
        .select("vec_id", "cluster_id", F.round(d2, 6).alias("d2"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy("d2", "cluster_id")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster_id", "d2")
    )
    w_rank = Window.partitionBy("cluster_id").orderBy(F.desc("d2"), "vec_id")
    w_cnt = Window.partitionBy("cluster_id")
    return (
        assigned.select(
            "vec_id",
            "cluster_id",
            "d2",
            F.row_number().over(w_rank).alias("hard_rank"),
            F.count("*").over(w_cnt).alias("n_cluster"),
        )
        .filter(F.expr("hard_rank <= (n_cluster + 1) div 2"))
        .select(
            "vec_id",
            "cluster_id",
            F.col("d2").alias("proto_dist"),
            F.col("hard_rank").cast("long").alias("hard_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget water-filling under epoch caps (Muennighoff et al. 2023)
# ---------------------------------------------------------------------------

_WF_MAX_EPOCHS = 2  # cap: no source repeats more than 2 epochs
_WF_BUDGET_NUM, _WF_BUDGET_DEN = 3, 2  # budget = 1.5x the unique-token pool


@register(
    "token_budget_waterfill",
    f"""
    WITH toks AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    per_source AS (
        SELECT source, CAST(count(*) AS BIGINT) AS avail_tokens,
               CAST(count(DISTINCT tok) AS BIGINT) AS vocab_w
        FROM toks GROUP BY 1
    ),
    sized AS (
        SELECT source, avail_tokens, vocab_w,
               avail_tokens * {_WF_MAX_EPOCHS} AS cap_tokens,
               CAST(avail_tokens * {_WF_MAX_EPOCHS} AS DOUBLE)
                   / CAST(vocab_w AS DOUBLE) AS fill_ratio,
               sum(avail_tokens) OVER () AS total_avail,
               sum(vocab_w) OVER () AS total_w,
               coalesce(sum(avail_tokens * {_WF_MAX_EPOCHS}) OVER (
                   ORDER BY CAST(avail_tokens * {_WF_MAX_EPOCHS} AS DOUBLE)
                            / CAST(vocab_w AS DOUBLE), source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_cap_excl,
               coalesce(sum(vocab_w) OVER (
                   ORDER BY CAST(avail_tokens * {_WF_MAX_EPOCHS} AS DOUBLE)
                            / CAST(vocab_w AS DOUBLE), source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_w_excl
        FROM per_source
    ),
    cands AS (
        SELECT *,
               (total_avail * {_WF_BUDGET_NUM}) // {_WF_BUDGET_DEN} AS budget,
               CAST((total_avail * {_WF_BUDGET_NUM}) // {_WF_BUDGET_DEN}
                    - cum_cap_excl AS DOUBLE)
                   / CAST(total_w - cum_w_excl AS DOUBLE) AS lam_cand
        FROM sized
    ),
    lam AS (
        SELECT lam_cand AS lam FROM (
            SELECT lam_cand, fill_ratio,
                   ROW_NUMBER() OVER (ORDER BY fill_ratio, source) AS rn
            FROM cands WHERE lam_cand <= fill_ratio
        ) WHERE rn = 1
    )
    SELECT s.source, s.avail_tokens, s.cap_tokens,
           least(s.cap_tokens,
                 CAST(floor(lam.lam * CAST(s.vocab_w AS DOUBLE)) AS BIGINT))
               AS alloc_tokens,
           round(CAST(least(s.cap_tokens,
                 CAST(floor(lam.lam * CAST(s.vocab_w AS DOUBLE)) AS BIGINT))
                 AS DOUBLE) / CAST(s.avail_tokens AS DOUBLE), 4) AS epochs,
           s.cap_tokens <= CAST(floor(lam.lam * CAST(s.vocab_w AS DOUBLE)) AS BIGINT)
               AS at_cap
    FROM sized s CROSS JOIN lam
    """,
    tags=("X-waterfill",),
)
def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation for data-constrained training (the
    planning problem behind Muennighoff et al. 2023): given a total
    training budget of 1.5x the unique-token pool, allocate tokens
    across sources proportionally to a per-source value weight (here:
    vocabulary size, an information proxy), capped at 2 epochs per
    source — repeating a source beyond a few epochs has rapidly decaying
    value, so capped sources' leftover budget re-waterfalls onto the
    rest. Classic water-filling, solved closed-form: sort sources by
    cap/weight, and the water level λ is the first prefix candidate
    (budget − Σ caps already bound) / (Σ weights not yet bound) that
    does not overflow its own source's cap; alloc = min(cap, λ·w).
    Every order-sensitive sum is integer (token counts); λ and the
    allocations involve only single IEEE divisions/multiplications, so
    both engines agree bit-for-bit with rounding only at the edge.

    Distributed shape: ONE data-grain pass (token explode feeding a
    per-source count + count-distinct aggregation); everything after is
    window arithmetic on a rows-=-sources frame, lazily checkpointed for
    its two consumers (λ probe + final allocation). At 100 TB the
    per-source stats frame is still |sources| rows — the solve costs
    nothing more at any corpus size, which is the point of doing the
    allocation analytically instead of simulating it."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    per_source = truncate_lineage(
        docs.select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .groupBy("source")
        .agg(
            F.count("*").alias("avail_tokens"),
            F.countDistinct("tok").alias("vocab_w"),
        ),
        eager=False,
    )
    me, bn, bd = _WF_MAX_EPOCHS, _WF_BUDGET_NUM, _WF_BUDGET_DEN
    cap = F.col("avail_tokens") * me
    ratio = cap.cast("double") / F.col("vocab_w").cast("double")
    w_all = Window.partitionBy()
    w_pfx = Window.orderBy("fill_ratio", "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sized = per_source.select(
        "source",
        "avail_tokens",
        "vocab_w",
        cap.alias("cap_tokens"),
        ratio.alias("fill_ratio"),
    ).select(
        "*",
        F.sum("avail_tokens").over(w_all).alias("total_avail"),
        F.sum("vocab_w").over(w_all).alias("total_w"),
        F.coalesce(F.sum("cap_tokens").over(w_pfx), F.lit(0)).alias("cum_cap_excl"),
        F.coalesce(F.sum("vocab_w").over(w_pfx), F.lit(0)).alias("cum_w_excl"),
    )
    sized = truncate_lineage(sized, eager=False)
    budget = F.expr(f"(total_avail * {bn}) div {bd}")
    lam_cand = (budget - F.col("cum_cap_excl")).cast("double") / (
        F.col("total_w") - F.col("cum_w_excl")
    ).cast("double")
    lam = (
        sized.select("source", "fill_ratio", lam_cand.alias("lam_cand"))
        .filter(F.col("lam_cand") <= F.col("fill_ratio"))
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("fill_ratio", "source"))
        )
        .filter(F.col("rn") == 1)
        .select(F.col("lam_cand").alias("lam"))
    )
    alloc = F.least(
        F.col("cap_tokens"),
        F.floor(F.col("lam") * F.col("vocab_w").cast("double")).cast("long"),
    )
    return (
        sized.crossJoin(F.broadcast(lam))
        .select(
            "source",
            "avail_tokens",
            "cap_tokens",
            alloc.alias("alloc_tokens"),
            F.round(
                alloc.cast("double") / F.col("avail_tokens").cast("double"), 4
            ).alias("epochs"),
            (
                F.col("cap_tokens")
                <= F.floor(F.col("lam") * F.col("vocab_w").cast("double")).cast("long")
            ).alias("at_cap"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-space eval-set decontamination
# ---------------------------------------------------------------------------

_DECON_TAU_I = 3200  # cosine >= 0.32 (scaled 1e4) flags contamination
_DECON_PACK = 1 << 21  # pack = (cos_i + 10000) * 2^21 + (2^21-1 - eval_id)


@register(
    "decontamination_semantic",
    f"""
    WITH ev AS (
        SELECT vec_id AS eval_id, embedding FROM embeddings WHERE vec_id % 10 = 0
    ),
    tr AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 != 0
    ),
    packs AS (
        SELECT tr.vec_id,
               max((CAST(round(({_MINE_COS.format(a="tr.embedding", b="ev.embedding")})
                        * 10000) AS BIGINT) + 10000) * {_DECON_PACK}
                   + ({_DECON_PACK - 1} - ev.eval_id)) AS pack
        FROM tr CROSS JOIN ev
        GROUP BY 1
    )
    SELECT vec_id,
           CAST({_DECON_PACK - 1} - pack % {_DECON_PACK} AS BIGINT) AS nearest_eval_id,
           round(CAST(pack // {_DECON_PACK} - 10000 AS DOUBLE) / 10000.0, 4)
               AS max_cos_sim,
           pack // {_DECON_PACK} - 10000 >= {_DECON_TAU_I} AS contaminated
    FROM packs
    """,
    tags=("X-decon-semantic",),
)
def decontamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: flag training vectors whose
    cosine to ANY eval-set vector exceeds a threshold — the semantic
    complement of decontamination_ngram_overlap, catching paraphrased or
    reformatted eval leakage that exact n-grams miss (the protocol used
    for modern LLM eval hygiene, e.g. the embedding-similarity decon in
    the Phi / GPT-4 technical reports). The per-train argmax over eval
    neighbors is ONE integer-packed max aggregation (winning-pattern 11):
    pack = (cos_i + 10000) * 2^21 + (2^21-1 - eval_id), the +10000 shift
    keeping negative cosines away from floor-vs-truncate division
    divergence; unpack yields both the nearest eval id (min id on ties)
    and the max similarity, with no struct compare, no window.

    Distributed shape: one training-corpus scan with the eval side
    broadcast (eval suites are tiny by construction) and one map-side
    combined aggregation keyed by vec_id — at 100 TB this is the
    cheapest possible all-train-x-all-eval screen, and the same plan
    accepts an LSH-bucketed eval side (embedding_near_dup_sign_lsh) when
    the eval suite itself grows."""
    emb = (
        fan_out(table(spark, sf_dir, "embeddings"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    ev = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("eval_id"), F.col("v").alias("yv")
    )
    tr = emb.filter(F.col("vec_id") % 10 != 0).select(
        "vec_id", F.col("v").alias("xv")
    )
    dot = F.aggregate(
        F.zip_with("xv", "yv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda t: t * t), F.lit(0.0), lambda acc, v: acc + v
            )
        )

    cos_i = F.round(dot / (norm(F.col("xv")) * norm(F.col("yv"))) * 10000, 0).cast(
        "long"
    )
    m = _DECON_PACK
    pack = (cos_i + 10000) * m + (F.lit(m - 1) - F.col("eval_id"))
    packs = (
        tr.crossJoin(F.broadcast(ev))
        .select("vec_id", pack.alias("pack"))
        .groupBy("vec_id")
        .agg(F.max("pack").alias("pack"))
    )
    return packs.select(
        "vec_id",
        (F.lit(m - 1) - F.col("pack") % m).cast("long").alias("nearest_eval_id"),
        F.round(
            (F.expr(f"pack div {m}") - 10000).cast("double") / 10000.0, 4
        ).alias("max_cos_sim"),
        (F.expr(f"pack div {m}") - 10000 >= _DECON_TAU_I).alias("contaminated"),
    )
