"""Round-8 continuation batch: canonical data-curation / retrieval /
statistics methods still absent from the catalog — cross-source quantile
normalization (the score-calibration step that makes per-domain quality
classifier outputs comparable before a global gate), interpolated
Kneser-Ney bigram probabilities (Kneser & Ney 1995; Chen & Goodman 1999
§2.7 — the smoothing family CCNet-style perplexity filters actually
train), MMR diversified top-k retrieval (Carbonell & Goldstein 1998),
the word2vec negative-sampling table (Mikolov et al. 2013 §2.2's
unigram^(3/4) distribution, drawn with deterministic inverse-CDF
uniforms), and a Heaps-law log-log fit over the vocabulary growth curve
(Heaps 1978) — the scaling diagnostic that tells you whether a corpus's
vocabulary is still growing or has saturated.

Engine-exactness strategy (catalog.py determinism rules): every
order-sensitive aggregate here is INTEGER arithmetic — micro-unit packed
distances (winning-pattern 11), integer cross-multiplied CDF compares,
micro-unit fixed-point log moments, micro-unit cumulative weights — so
the only doubles are final divisions rounded at the edge. x^(3/4) is
computed as sqrt(x * sqrt(x)): IEEE 754 requires sqrt to be correctly
rounded, so the value is bit-identical on both engines, unlike pow().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from ..operators.textstats import quality_score_col
from .catalog import register, table
from .training import _QUALITY_SCORE_SQL

# ---------------------------------------------------------------------------
# Cross-source quantile normalization of quality scores
# ---------------------------------------------------------------------------


@register(
    "quantile_normalize_scores",
    f"""
    WITH scored AS (
        SELECT source, {_QUALITY_SCORE_SQL} AS q FROM documents
    ),
    cells AS (
        SELECT source, q, CAST(count(*) AS BIGINT) AS cnt
        FROM scored GROUP BY 1, 2
    ),
    src AS (
        SELECT source, q, cnt,
               sum(cnt) OVER (PARTITION BY source ORDER BY q
                              ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cnt) OVER (PARTITION BY source) AS n_s
        FROM cells
    ),
    ggrid AS (
        SELECT q AS gq, sum(cnt) AS gcnt,
               sum(sum(cnt)) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING) AS gcum
        FROM cells GROUP BY q
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored)
    SELECT s.source, s.q AS quality_score, s.cnt AS n_docs,
           round(CAST(2 * s.cum - s.cnt AS DOUBLE)
                 / CAST(2 * s.n_s AS DOUBLE), 5) AS pct,
           min(g.gq) AS normalized_score
    FROM src s CROSS JOIN n
    JOIN ggrid g ON g.gcum * 2 * s.n_s >= (2 * s.cum - s.cnt) * n.n
    GROUP BY 1, 2, 3, 4
    """,
    tags=("X-quantile-normalize",),
)
def quantile_normalize_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization: map every document's quality
    score to the GLOBAL score distribution's value at the same
    within-source mid-CDF rank, so a score of 0.6 from a lenient source
    and 0.45 from a harsh one land on the same calibrated scale — the
    standard pre-gate step when per-domain classifier outputs are not
    comparable (same statistical transform as microarray quantile
    normalization, Bolstad et al. 2003).

    Everything runs at the (source, score) GRID grain — the 4-dp-rounded
    composite score is already discrete — so no per-document window ever
    exists: per-source mid-CDF p = (2*cum - cnt) / (2*n_s) and the
    global inverse CDF G^-1(p) = min grid score with gcum/N >= p are
    both grid-size frames, and the lookup comparison is INTEGER
    cross-multiplied (gcum * 2*n_s >= (2*cum - cnt) * N) so the match is
    exact on both engines with no float boundary. Distributed shape: one
    scan with the score fused into the projection, two grid-grain
    aggregations, and a broadcast-size non-equi join + min; at 100 TB
    the grid is (sources x 10^4 score values) — constant in corpus
    size."""
    docs = table(spark, sf_dir, "documents")
    scored = docs.select("source", quality_score_col(F.col("text")).alias("q"))
    cells = scored.groupBy("source", "q").agg(F.count("*").cast("long").alias("cnt"))
    cells = truncate_lineage(cells, eager=False)
    w_src = Window.partitionBy("source").orderBy("q").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    src = cells.select(
        "source",
        "q",
        "cnt",
        F.sum("cnt").over(w_src).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("source")).alias("n_s"),
    )
    w_glob = Window.orderBy("gq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    glob = (
        cells.groupBy(F.col("q").alias("gq"))
        .agg(F.sum("cnt").alias("gcnt"))
        .select("gq", F.sum("gcnt").over(w_glob).alias("gcum"))
    )
    # Corpus size from the checkpointed grid, not a second scored scan —
    # re-running the regex-heavy score projection just to count rows
    # doubled the warm time.
    n = cells.agg(F.sum("cnt").cast("long").alias("n"))
    return (
        src.crossJoin(F.broadcast(n))
        .join(
            F.broadcast(glob),
            F.col("gcum") * 2 * F.col("n_s")
            >= (2 * F.col("cum") - F.col("cnt")) * F.col("n"),
        )
        .groupBy(
            "source",
            F.col("q").alias("quality_score"),
            F.col("cnt").alias("n_docs"),
            F.round(
                (2 * F.col("cum") - F.col("cnt")).cast("double")
                / (2 * F.col("n_s")).cast("double"),
                5,
            ).alias("pct"),
        )
        .agg(F.min("gq").alias("normalized_score"))
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram probabilities
# ---------------------------------------------------------------------------

_KN_D = 0.75
_KN_TOPK = 25


@register(
    "kneser_ney_bigram_probs",
    f"""
    WITH toks AS (
        SELECT string_split(lower(text), ' ') AS ws FROM documents
        WHERE len(string_split(lower(text), ' ')) >= 2
    ),
    bi AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT ws[i] AS w1, ws[i + 1] AS w2
              FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
                    FROM toks))
        GROUP BY 1, 2
    ),
    fwd AS (
        SELECT w1, CAST(sum(c) AS BIGINT) AS cw1,
               CAST(count(*) AS BIGINT) AS n_fwd
        FROM bi GROUP BY 1
    ),
    bwd AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_bwd FROM bi GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bi),
    ranked AS (
        SELECT bi.w1, bi.w2, bi.c, fwd.cw1, fwd.n_fwd, bwd.n_bwd, tot.b,
               ROW_NUMBER() OVER (ORDER BY bi.c DESC, bi.w1, bi.w2) AS rn
        FROM bi JOIN fwd USING (w1) JOIN bwd USING (w2) CROSS JOIN tot
    )
    SELECT w1, w2, c AS bigram_count, cw1 AS context_count,
           n_fwd AS continuations_fwd, n_bwd AS continuations_bwd,
           round({_KN_D} * CAST(n_fwd AS DOUBLE) / CAST(cw1 AS DOUBLE), 6)
               AS backoff_weight,
           round((CAST(c AS DOUBLE) - {_KN_D}) / CAST(cw1 AS DOUBLE)
                 + ({_KN_D} * CAST(n_fwd AS DOUBLE) / CAST(cw1 AS DOUBLE))
                   * (CAST(n_bwd AS DOUBLE) / CAST(b AS DOUBLE)), 6) AS p_kn
    FROM ranked WHERE rn <= {_KN_TOPK}
    """,
    tags=("X-kneser-ney",),
)
def kneser_ney_bigram_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram model (Kneser & Ney 1995; the
    Chen & Goodman 1999 §2.7 interpolated form with a single absolute
    discount D=0.75): P(w2|w1) = max(c - D, 0)/c(w1) +
    (D * N1+(w1,*)/c(w1)) * (N1+(*,w2)/B), where the continuation
    probability counts in how many CONTEXTS a word appears rather than
    how often — the correction that keeps "francisco" from inheriting
    "san francisco"'s raw frequency. This is the smoothing family the
    KenLM models behind CCNet-style perplexity filters actually use;
    the existing ccnet/bigram-cross-entropy queries consume such a
    model, this one BUILDS its parameter table. max(c-D,0) = c-D here
    because the bigram frame only contains observed bigrams (c >= 1 >
    D). Emits the top-25 bigrams by raw count (integer-deterministic
    ordering) with their discounted probability and backoff weight.

    Distributed shape: one zip_with bigram explode into a map-side-
    combined count (the only data-grain shuffle); the context (c(w1),
    N1+(w1,*)) and continuation (N1+(*,w2)) frames both AGGREGATE the
    bigram frame — Heaps-law-bounded grain — and join back on their
    keys; B rides as a broadcast scalar. The final doubles are three
    divisions on int64 counts, identical on both engines, rounded at
    the edge."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    toks = docs.select(ws.alias("ws")).filter(F.size("ws") >= 2)
    bi = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c"))
    )
    bi = truncate_lineage(bi, eager=False)
    fwd = bi.groupBy("w1").agg(
        F.sum("c").cast("long").alias("cw1"),
        F.count("*").cast("long").alias("n_fwd"),
    )
    bwd = bi.groupBy("w2").agg(F.count("*").cast("long").alias("n_bwd"))
    tot = bi.agg(F.count("*").cast("long").alias("b"))
    joined = (
        bi.join(fwd, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(tot))
    )
    ranked = joined.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("c"), "w1", "w2"))
    ).filter(F.col("rn") <= _KN_TOPK)
    c, cw1 = F.col("c").cast("double"), F.col("cw1").cast("double")
    n_fwd = F.col("n_fwd").cast("double")
    n_bwd, b = F.col("n_bwd").cast("double"), F.col("b").cast("double")
    return ranked.select(
        "w1",
        "w2",
        F.col("c").alias("bigram_count"),
        F.col("cw1").alias("context_count"),
        F.col("n_fwd").alias("continuations_fwd"),
        F.col("n_bwd").alias("continuations_bwd"),
        F.round(F.lit(_KN_D) * n_fwd / cw1, 6).alias("backoff_weight"),
        F.round(
            (c - F.lit(_KN_D)) / cw1
            + (F.lit(_KN_D) * n_fwd / cw1) * (n_bwd / b),
            6,
        ).alias("p_kn"),
    )


# ---------------------------------------------------------------------------
# MMR diversified top-k retrieval (Carbonell & Goldstein 1998)
# ---------------------------------------------------------------------------

_MMR_ROUNDS = 5  # total picks (round 1 = pure relevance argmax)
_MMR_PACK = 1 << 21
_MMR_OFF = 1 << 33  # shifts the (possibly negative) MMR score non-negative

_D2_SQL = """list_sum(list_transform(generate_series(1, len({a}.embedding)),
    i -> (CAST({a}.embedding[i] AS DOUBLE) - CAST({b}.embedding[i] AS DOUBLE))
       * (CAST({a}.embedding[i] AS DOUBLE) - CAST({b}.embedding[i] AS DOUBLE))))"""


def _mmr_oracle() -> str:
    """Unrolled SQL for the MMR greedy loop: round 1 picks the most
    query-relevant vector (min squared distance to the query, min-id
    tiebreak); rounds 2..k maximize mmr = min-dist-to-selected minus
    dist-to-query (the lambda=0.5 MMR objective in micro-unit integers,
    offset non-negative before the argmax pack)."""
    m, off = _MMR_PACK, _MMR_OFF
    d2_eq = _D2_SQL.format(a="e", b="q")
    d2_ec = _D2_SQL.format(a="e", b="c")
    parts = [
        "qv AS (SELECT embedding, vec_id FROM embeddings "
        "WHERE vec_id = (SELECT min(vec_id) FROM embeddings))",
        f"""relq AS (
        SELECT e.vec_id, e.embedding,
               CAST(round(({d2_eq}) * 1000000) AS BIGINT) AS relq
        FROM embeddings e CROSS JOIN qv q
        WHERE e.vec_id <> q.vec_id
    )""",
        f"""pick1 AS (
        SELECT min(relq * {m} + vec_id) AS p FROM relq
    )""",
        f"""sel1 AS (SELECT CAST(p % {m} AS BIGINT) AS id,
        -CAST(p // {m} AS DOUBLE) / 1000000.0 AS score FROM pick1)""",
    ]
    prev_ids = "SELECT id FROM sel1"
    for r in range(2, _MMR_ROUNDS + 1):
        parts.append(f"""ctr{r} AS ({prev_ids}),
    mind{r} AS (
        SELECT e.vec_id, e.relq,
               min(CAST(round(({d2_ec}) * 1000000) AS BIGINT)) AS ds
        FROM relq e
        CROSS JOIN (SELECT embedding FROM embeddings
                    WHERE vec_id IN (SELECT id FROM ctr{r})) c
        WHERE e.vec_id NOT IN (SELECT id FROM ctr{r})
        GROUP BY 1, 2
    ),
    pick{r} AS (
        SELECT max((ds - relq + {off}) * {m} + ({m - 1} - vec_id)) AS p
        FROM mind{r}
    ),
    sel{r} AS (SELECT CAST({m - 1} - p % {m} AS BIGINT) AS id,
        CAST(p // {m} - {off} AS DOUBLE) / 1000000.0 AS score FROM pick{r})""")
        prev_ids += f" UNION ALL SELECT id FROM sel{r}"
    selects = [
        f"SELECT CAST({r} AS INT) AS rank, id AS vec_id, "
        f"round(score, 6) AS mmr_score FROM sel{r}"
        for r in range(1, _MMR_ROUNDS + 1)
    ]
    return "WITH " + ",\n    ".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@register("mmr_diversified_topk", _mmr_oracle(), tags=("X-mmr",))
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversified retrieval (Carbonell &
    Goldstein 1998) at lambda = 0.5, distance-flavored: round 1 picks
    the vector closest to the query (the min-id corpus vector), then
    each round adds argmax_i [ min_{s in S} d2(i, s) - d2(q, i) ] —
    relevant to the query but far from everything already selected, the
    standard redundancy-killer on top of a dense retriever's shortlist.

    Both sides of the objective are micro-unit INTEGER distances, so
    the per-round argmax is one integer pack (winning-pattern 11) with
    the MMR score offset non-negative before packing — Python's
    floor-mod and DuckDB's truncation-mod agree only on non-negative
    values, so the offset is correctness, not cosmetics. Distributed
    shape (coreset_kcenter_greedy precedent): per round one corpus scan
    against the <= 5-row broadcast selected frame, one map-side-combined
    min per vector, one scalar argmax collect — bounded data-dependent
    iteration with the driver touching ONE row per round. At 100 TB the
    candidate frame is a prior ANN shortlist instead of the full corpus;
    the loop shape is unchanged."""
    emb = truncate_lineage(
        table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        eager=False,
    )
    m, off = _MMR_PACK, _MMR_OFF
    qid = emb.agg(F.min("vec_id")).collect()[0][0]
    qv = emb.filter(F.col("vec_id") == qid).select(F.col("v").alias("qv"))
    d2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    relq = truncate_lineage(
        emb.filter(F.col("vec_id") != qid)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "v",
            F.round(d2(F.col("v"), F.col("qv")) * 1000000, 0)
            .cast("long")
            .alias("relq"),
        ),
        eager=False,
    )
    p1 = relq.agg(F.min(F.col("relq") * m + F.col("vec_id")).alias("p")).collect()[
        0
    ]["p"]
    ids = [p1 % m]
    out = [(1, ids[0], round(-(p1 // m) / 1000000.0, 6))]
    for r in range(2, _MMR_ROUNDS + 1):
        chosen = emb.filter(F.col("vec_id").isin(ids)).select(F.col("v").alias("cv"))
        ds = F.round(d2(F.col("v"), F.col("cv")) * 1000000, 0).cast("long")
        mind = (
            relq.filter(~F.col("vec_id").isin(ids))
            .crossJoin(F.broadcast(chosen))
            .select("vec_id", "relq", ds.alias("ds"))
            .groupBy("vec_id", "relq")
            .agg(F.min("ds").alias("ds"))
        )
        pack = F.max(
            (F.col("ds") - F.col("relq") + off) * m
            + (F.lit(m - 1) - F.col("vec_id"))
        )
        p = mind.agg(pack.alias("p")).collect()[0]["p"]
        cid = (m - 1) - p % m
        ids.append(cid)
        out.append((r, cid, round((p // m - off) / 1000000.0, 6)))
    return spark.createDataFrame(out, "rank INT, vec_id BIGINT, mmr_score DOUBLE")


# ---------------------------------------------------------------------------
# word2vec negative-sampling table (Mikolov et al. 2013 §2.2)
# ---------------------------------------------------------------------------

_NEG_DRAWS = 2048
_NEG_TOPK = 30


@register(
    "negative_sampling_table",
    f"""
    WITH uni AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
        GROUP BY 1
    ),
    wt AS (
        SELECT tok, c,
               CAST(round(sqrt(CAST(c AS DOUBLE) * sqrt(CAST(c AS DOUBLE)))
                          * 1000000) AS BIGINT) AS w
        FROM uni
    ),
    bands AS (
        SELECT tok, c, w,
               sum(w) OVER (ORDER BY tok ROWS UNBOUNDED PRECEDING) AS hi
        FROM wt
    ),
    tot AS (SELECT max(hi) AS s FROM bands),
    draws AS (
        SELECT b.tok, CAST(count(*) AS BIGINT) AS n_drawn
        FROM (SELECT (('0x' || substr(md5('neg:' || CAST(j AS VARCHAR)), 1, 15))::BIGINT
                      + 0.5) / {float(1 << 60)!r} AS u
              FROM (SELECT unnest(generate_series(0, {_NEG_DRAWS - 1})) AS j)) d
        CROSS JOIN tot
        JOIN bands b ON d.u * tot.s >= b.hi - b.w AND d.u * tot.s < b.hi
        GROUP BY 1
    ),
    ranked AS (
        SELECT b.tok, b.c, b.w, COALESCE(d.n_drawn, 0) AS n_drawn,
               ROW_NUMBER() OVER (ORDER BY b.c DESC, b.tok) AS rn
        FROM bands b LEFT JOIN draws d USING (tok)
    )
    SELECT tok AS token, c AS unigram_count,
           round(CAST(w AS DOUBLE) / CAST(s AS DOUBLE), 6) AS p_smoothed,
           round({_NEG_DRAWS} * CAST(w AS DOUBLE) / CAST(s AS DOUBLE), 2)
               AS expected_draws,
           CAST(n_drawn AS BIGINT) AS n_drawn
    FROM ranked CROSS JOIN tot WHERE rn <= {_NEG_TOPK}
    """,
    tags=("X-negative-sampling",),
)
def negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling distribution (Mikolov et al. 2013
    §2.2): tokens are drawn proportionally to count^(3/4) — the
    smoothing that lifts rare words without letting stopwords dominate —
    here materialized as cumulative micro-unit integer bands and sampled
    with {_NEG_DRAWS} deterministic inverse-CDF uniforms (the portable
    md5 hash family), so the draw is replayable on any engine and any
    retry. Emits the top-{_NEG_TOPK} tokens by count with their smoothed
    probability, expected draw count, and actual draw count.

    count^0.75 is computed as sqrt(c * sqrt(c)): IEEE 754 sqrt is
    correctly rounded, so both engines produce the identical double
    where pow(c, 0.75) may differ by an ulp between libm
    implementations. The weights become micro-unit INTEGERS before the
    cumulative sum, so band edges are exact (no float accumulation
    order anywhere); the uniforms are scaled by the integer total and
    each lands in exactly one band. Distributed shape: one token
    explode into a map-side-combined count, a vocabulary-grain (Heaps
    small; documented single-partition) cumulative window, and the
    {_NEG_DRAWS}-row uniform frame joined in one broadcast pass."""
    docs = table(spark, sf_dir, "documents")
    uni = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    cd = F.col("c").cast("double")
    wt = uni.select(
        "tok", "c", F.round(F.sqrt(cd * F.sqrt(cd)) * 1000000, 0).cast("long").alias("w")
    )
    w_cum = Window.orderBy("tok").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bands = truncate_lineage(
        wt.select("tok", "c", "w", F.sum("w").over(w_cum).alias("hi")), eager=False
    )
    tot = bands.agg(F.max("hi").alias("s"))
    uniforms = spark.range(_NEG_DRAWS).select(
        (
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("neg:"), F.col("id").cast("string"))), 1, 15),
                    16,
                    10,
                ).cast("long")
                + F.lit(0.5)
            )
            / F.lit(float(1 << 60))
        ).alias("u")
    )
    draws = (
        bands.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(uniforms),
            (F.col("u") * F.col("s") >= F.col("hi") - F.col("w"))
            & (F.col("u") * F.col("s") < F.col("hi")),
        )
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("n_drawn"))
    )
    ranked = (
        bands.join(draws, "tok", "left")
        .withColumn("n_drawn", F.coalesce("n_drawn", F.lit(0)))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc("c"), "tok")))
        .filter(F.col("rn") <= _NEG_TOPK)
    )
    wd = F.col("w").cast("double")
    return ranked.crossJoin(F.broadcast(tot)).select(
        F.col("tok").alias("token"),
        F.col("c").alias("unigram_count"),
        F.round(wd / F.col("s").cast("double"), 6).alias("p_smoothed"),
        F.round(F.lit(_NEG_DRAWS) * wd / F.col("s").cast("double"), 2).alias(
            "expected_draws"
        ),
        F.col("n_drawn").cast("long").alias("n_drawn"),
    )




# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth: integer doubling-grid anchors of the curve
# ---------------------------------------------------------------------------


def heaps_anchor_frames(spark: SparkSession, sf_dir: str):
    """Shared upstream for heaps_law_loglog_fit and its aggregate probe
    heaps_moments_probe (plans/round11.py): the cumulative
    (tokens-read, vocabulary-size) curve in doc_id order, reduced to one
    anchor point per doubling bucket of cum_tokens. Returns
    (anchors, totals) — both pure-integer frames.

    Why anchors and not a fitted beta: the r9-r11 CORRECTNESS history
    convicted per-point ``round(ln(·)·1e6)`` quantization as divergent
    between DuckDB builds (1.0.0 local vs the driver's 1.2.0 — libm
    ``ln`` at a .5e-6 rounding boundary; the r11 heaps_moments_probe
    bisect proved it: raw integer moments hashed red while every
    all-integer division tail was exact). Round 12 therefore removes
    ``ln`` from the hashed surface entirely — the hll_source_cardinality
    pattern — and emits raw integer (cum_tokens, cum_vocab) anchor
    points on a log2-spaced grid; the 2-parameter log-log OLS fit is a
    trivial consumer-side transform of ≤63 rows (see
    tests/test_round8c.py for the numpy recompute).

    The doubling bucket is computed INTEGER-EXACTLY despite using
    ``floor(log2(x))``: libm log2 is within 1 ulp of truth, so the
    floored value can be off by at most ±1 near a power-of-2 boundary,
    and the two integer shift comparisons after it (``2^(k+1) <= x`` →
    k+1; ``2^k > x`` → k-1) correct any such error deterministically on
    both engines. No libm value ever reaches the output.

    Anchor selection: cum_tokens and cum_vocab are both monotone
    nondecreasing in doc order, so ``max(cum_tokens), max(cum_vocab)``
    per bucket is exactly the bucket's LAST curve point — a real point
    on the curve, deterministically chosen with no tiebreak surface.

    Distributed shape: one token explode to (word -> first doc) —
    map-side combined — then everything runs at doc grain (the curve's
    cumulative window is the documented vocabulary-curve
    single-partition, bounded by doc count after aggregation; the
    100 TB path checkpoints shard-level curve points, not raw docs),
    and the anchor reduction collapses it to ≤63 rows before emission."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    toks = truncate_lineage(docs.select("doc_id", ws.alias("ws")), eager=False)
    doc_tok = toks.select("doc_id", F.size("ws").cast("long").alias("nt"))
    firsts = (
        toks.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    nw = firsts.groupBy("first_doc").agg(F.count("*").cast("long").alias("new_words"))
    w_cum = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = truncate_lineage(
        doc_tok.join(nw, doc_tok.doc_id == nw.first_doc, "left").select(
            doc_tok.doc_id,
            F.sum("nt").over(w_cum).alias("cum_tokens"),
            F.sum(F.coalesce("new_words", F.lit(0))).over(w_cum).alias("cum_vocab"),
        ),
        eager=False,
    )
    bk = curve.filter(F.col("cum_tokens") >= 1).select(
        "cum_tokens",
        "cum_vocab",
        F.greatest(
            F.floor(F.log2(F.col("cum_tokens").cast("double"))).cast("long"),
            F.lit(0).cast("long"),
        ).alias("k0"),
    )
    bucketed = bk.select(
        "cum_tokens",
        "cum_vocab",
        F.expr(
            "CAST(CASE WHEN shiftleft(CAST(1 AS BIGINT), CAST(k0 + 1 AS INT))"
            "               <= cum_tokens THEN k0 + 1"
            "          WHEN shiftleft(CAST(1 AS BIGINT), CAST(k0 AS INT))"
            "               > cum_tokens THEN k0 - 1"
            "          ELSE k0 END AS BIGINT)"
        ).alias("bucket"),
    )
    anchors = bucketed.groupBy("bucket").agg(
        F.max("cum_tokens").cast("long").alias("anchor_tokens"),
        F.max("cum_vocab").cast("long").alias("anchor_vocab"),
    )
    totals = curve.agg(
        F.max("cum_tokens").cast("long").alias("total_tokens"),
        F.max("cum_vocab").cast("long").alias("total_vocab"),
    )
    return anchors, totals


# Shared oracle CTE prefix: raw docs → cumulative curve → exact integer
# doubling-bucket anchors. f-string-spliced into both heaps_law_loglog_fit
# (below) and heaps_moments_probe (round11.py) so the driver run exercises
# the IDENTICAL upstream SQL. The floor(log2) ±1 correction mirrors the
# Spark side — no libm value reaches any emitted column.
HEAPS_CURVE_CTES = """
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    doc_tok AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS nt FROM toks),
    firsts AS (
        SELECT min(doc_id) AS first_doc
        FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
        GROUP BY w
    ),
    nw AS (SELECT first_doc, CAST(count(*) AS BIGINT) AS new_words
           FROM firsts GROUP BY 1),
    curve AS (
        SELECT d.doc_id,
               sum(d.nt) OVER (ORDER BY d.doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_tokens,
               sum(COALESCE(n.new_words, 0)) OVER (ORDER BY d.doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_vocab
        FROM doc_tok d LEFT JOIN nw n ON d.doc_id = n.first_doc
    ),
    bk AS (
        SELECT cum_tokens, cum_vocab,
               greatest(CAST(floor(log2(CAST(cum_tokens AS DOUBLE)))
                             AS BIGINT), 0) AS k0
        FROM curve WHERE cum_tokens >= 1
    ),
    bucketed AS (
        SELECT cum_tokens, cum_vocab,
               CAST(CASE WHEN (CAST(1 AS BIGINT) << (k0 + 1)) <= cum_tokens
                              THEN k0 + 1
                         WHEN (CAST(1 AS BIGINT) << k0) > cum_tokens
                              THEN k0 - 1
                         ELSE k0 END AS BIGINT) AS bucket
        FROM bk
    ),
    anchors AS (
        SELECT bucket,
               CAST(max(cum_tokens) AS BIGINT) AS anchor_tokens,
               CAST(max(cum_vocab) AS BIGINT) AS anchor_vocab
        FROM bucketed GROUP BY bucket
    ),
    totals AS (
        SELECT CAST(max(cum_tokens) AS BIGINT) AS total_tokens,
               CAST(max(cum_vocab) AS BIGINT) AS total_vocab
        FROM curve
    )
"""


@register(
    "heaps_law_loglog_fit",
    HEAPS_CURVE_CTES
    + """
    SELECT a.bucket, a.anchor_tokens, a.anchor_vocab,
           t.total_tokens, t.total_vocab
    FROM anchors a CROSS JOIN totals t
    """,
    tags=("X-heaps-fit",),
)
def heaps_law_loglog_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law V(n) = K * n^beta (Heaps 1978) fit INPUTS: the
    vocabulary-growth curve's doubling-grid anchor points — one
    (cum_tokens, cum_vocab) pair per log2 bucket of tokens read, i.e.
    exactly the log-spaced sample a log-log OLS wants — plus the curve
    totals. All five columns are raw BIGINTs; the log transform and the
    2-parameter fit run consumer-side over ≤63 rows (numpy recompute in
    tests/test_round8c.py asserts beta lands in the sublinear band).

    History (why the fit left the hashed surface): r9/r10/r11 hashed
    red on the driver's DuckDB 1.2.0 while exact on local 1.0.0; the
    r11 all-integer division rewrite plus the raw-moment probe bisected
    the divergence to the per-point ``round(ln(·)·1e6)`` quantization —
    cross-build libm, unfixable by more integer tail work. This rewrite
    removes ``ln`` entirely (the hll_source_cardinality pattern:
    integer-exact hashed output, transcendental math left to the
    consumer). The doubling bucket uses floor(log2) with a ±1 integer
    shift correction, so it is exact regardless of libm (see
    heaps_anchor_frames).

    Scaling read: anchors are log-spaced by construction, so the output
    is ≤63 rows at ANY corpus size — the 100 TB emission is identical
    in shape to sf0.001, and the consumer-side fit cost is constant."""
    anchors, totals = heaps_anchor_frames(spark, sf_dir)
    return anchors.crossJoin(F.broadcast(totals)).select(
        "bucket", "anchor_tokens", "anchor_vocab", "total_tokens", "total_vocab"
    )
