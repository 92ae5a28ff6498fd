"""Round-8 continuation batch 4: the remaining classics of their
families — Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001),
the fourth canonical retrieval scorer next to BM25 / TF-IDF / ColBERT;
the Wilcoxon signed-rank test (Wilcoxon 1945), the PAIRED nonparametric
companion to the unpaired Mann-Whitney already in the catalog; KR-20
internal-consistency reliability (Kuder & Richardson 1937), the binary
special case of Cronbach's alpha, over the quality-gate item battery;
Wald's sequential probability ratio test (Wald 1945) over the event
stream, the SEQUENTIAL companion to the fixed-horizon ab_test_welch_t;
and McNemar's test (McNemar 1947) for paired gate disagreement.

Engine-exactness: per-row closed-form expressions (query likelihood),
integer mid-ranks doubled to dodge halves (Wilcoxon), pure integer
count ratios (KR-20, McNemar), and nano-unit integer log-likelihood
increments so the SPRT's running sum is exact integer arithmetic with
a hierarchical day-partitioned cumsum (no global data-grain window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table
from .training import _BM25_TERMS

# ---------------------------------------------------------------------------
# Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001)
# ---------------------------------------------------------------------------

_QL_MU = 100.0
_QL_TOPK = 15


def _ql_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    cf_cols = ", ".join(f"sum(tf_{i}) AS cf_{i}" for i in range(len(_BM25_TERMS)))
    score = " + ".join(
        f"ln((tf_{i} + {_QL_MU} * cf_{i} / ctot) / (dl + {_QL_MU}))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH docs AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    per_doc AS (
        SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, {tf_cols} FROM docs
    ),
    corpus AS (
        SELECT CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) AS ctot, {cf_cols}
        FROM per_doc
    ),
    scored AS (
        SELECT doc_id, {score} AS s,
               ROW_NUMBER() OVER (ORDER BY {score} DESC, doc_id) AS rn
        FROM per_doc, corpus
    )
    SELECT doc_id, round(s, 5) AS log_likelihood
    FROM scored WHERE rn <= {_QL_TOPK}
    """


@register("query_likelihood_dirichlet", _ql_oracle(), tags=("X-query-likelihood",))
def query_likelihood_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    2001): score(d) = sum_t ln((tf + mu * cf_t/|C|) / (dl + mu)) with
    mu = {_QL_MU} (sized to this corpus's ~150-token documents) over the
    same fixed query terms as bm25_doc_scores, so the two scorers are
    directly comparable on identical inputs — the language-modeling
    member of the catalog's retrieval family (BM25, TF-IDF cosine,
    ColBERT MaxSim, RRF fusion). Smoothing by the collection model is
    what keeps a missing term from zeroing the document.

    The whole score is ONE per-row closed-form expression (term
    frequencies are narrow array_filter counts, the collection stats
    ride in as a broadcast scalar row), so both engines evaluate the
    identical double expression tree — no aggregation-order float risk
    anywhere. The top-{_QL_TOPK} ranking orders on the RAW double with a
    doc_id tiebreak. Distributed shape: one scan with fused tf columns,
    one tiny scalar aggregate, TakeOrderedAndProject."""
    docs = table(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), " ")

    def _tf(term: str, i: int):
        # closure per term: a two-arg lambda would be read as the
        # (element, index) filter variant
        return F.size(F.filter(w, lambda x: x == F.lit(term))).alias(f"tf_{i}")

    tf_cols = [_tf(t, i) for i, t in enumerate(_BM25_TERMS)]
    per_doc = docs.select(
        "doc_id", F.size(w).cast("double").alias("dl"), *tf_cols
    )
    per_doc = truncate_lineage(per_doc, eager=False)
    corpus = per_doc.agg(
        F.sum(F.col("dl").cast("long")).cast("double").alias("ctot"),
        *[F.sum(f"tf_{i}").alias(f"cf_{i}") for i in range(len(_BM25_TERMS))],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        term = F.log(
            (F.col(f"tf_{i}") + _QL_MU * F.col(f"cf_{i}") / F.col("ctot"))
            / (F.col("dl") + _QL_MU)
        )
        score = term if score is None else score + term
    ranked = (
        per_doc.crossJoin(F.broadcast(corpus))
        .select("doc_id", score.alias("s"))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc("s"), "doc_id")))
        .filter(F.col("rn") <= _QL_TOPK)
    )
    return ranked.select("doc_id", F.round("s", 5).alias("log_likelihood"))


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank test on paired daily counts (Wilcoxon 1945)
# ---------------------------------------------------------------------------


@register(
    "wilcoxon_signed_rank_daily",
    """
    WITH daily AS (
        SELECT ts::DATE AS day,
               CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
                   - CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
                   AS diff
        FROM events GROUP BY 1
    ),
    nz AS (SELECT day, diff, abs(diff) AS ad FROM daily WHERE diff <> 0),
    grid AS (
        SELECT ad, CAST(count(*) AS BIGINT) AS c,
               sum(count(*)) OVER (ORDER BY ad ROWS UNBOUNDED PRECEDING) AS cum
        FROM nz GROUP BY ad
    ),
    ranked AS (
        SELECT nz.diff, 2 * (g.cum - g.c) + g.c + 1 AS midrank2
        FROM nz JOIN grid g USING (ad)
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN diff > 0 THEN midrank2 ELSE 0 END) AS BIGINT)
                   AS w2_plus,
               CAST(sum(CASE WHEN diff < 0 THEN midrank2 ELSE 0 END) AS BIGINT)
                   AS w2_minus
        FROM ranked
    )
    SELECT n AS n_days,
           round(CAST(w2_plus AS DOUBLE) / 2, 1) AS w_plus,
           round(CAST(w2_minus AS DOUBLE) / 2, 1) AS w_minus,
           round((CAST(w2_plus AS DOUBLE) / 2 - CAST(n * (n + 1) AS DOUBLE) / 4)
                 / sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 24), 5)
               AS z_score
    FROM agg
    """,
    tags=("X-wilcoxon",),
)
def wilcoxon_signed_rank_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon 1945) on the paired daily
    (click, view) counts: are clicks systematically higher than views
    day over day? The PAIRED companion to mannwhitney_source_lengths
    (unpaired) — pairing by day removes the day-to-day volume swing the
    unpaired test would drown in. Zero differences are dropped
    (standard), ties get midranks, and the large-sample z uses the
    untied null variance n(n+1)(2n+1)/24 (tie correction omitted — at
    count grain ties in |diff| are rare; documented, not hidden).

    Midranks are kept as DOUBLED integers (lo + hi = 2*cum_before +
    count + 1), so the rank sums are exact int64 arithmetic and the
    halves only appear in the final /2 at the edge — no float
    accumulation. Distributed shape: one conditional-count aggregation
    to day grain, a |diff|-grid cumulative window (bounded by distinct
    values), one join back, one scalar row out."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.count(F.when(F.col("event_type") == "click", 1))
            - F.count(F.when(F.col("event_type") == "view", 1))
        )
        .cast("long")
        .alias("diff")
    )
    nz = daily.filter(F.col("diff") != 0).select(
        "diff", F.abs("diff").alias("ad")
    )
    nz = truncate_lineage(nz, eager=False)
    w_g = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid = (
        nz.groupBy("ad")
        .agg(F.count("*").cast("long").alias("c"))
        .select("ad", "c", F.sum("c").over(w_g).alias("cum"))
    )
    ranked = nz.join(F.broadcast(grid), "ad").select(
        "diff",
        (2 * (F.col("cum") - F.col("c")) + F.col("c") + 1).alias("midrank2"),
    )
    agg = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("diff") > 0, F.col("midrank2")).otherwise(0))
        .cast("long")
        .alias("w2_plus"),
        F.sum(F.when(F.col("diff") < 0, F.col("midrank2")).otherwise(0))
        .cast("long")
        .alias("w2_minus"),
    )
    n = F.col("n")
    w_plus = F.col("w2_plus").cast("double") / 2
    return agg.select(
        n.alias("n_days"),
        F.round(w_plus, 1).alias("w_plus"),
        F.round(F.col("w2_minus").cast("double") / 2, 1).alias("w_minus"),
        F.round(
            (w_plus - (n * (n + 1)).cast("double") / 4)
            / F.sqrt((n * (n + 1) * (2 * n + 1)).cast("double") / 24),
            5,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# KR-20 reliability of the binary quality-gate battery (Kuder & Richardson 1937)
# ---------------------------------------------------------------------------

# Integer-comparison gate definitions: (name, predicate builder). Each is a
# pure integer/ratio comparison so the booleans are engine-exact.
_KR_GATES_SQL = (
    ("len_ge_64", "len(string_split(lower(text), ' ')) >= 64"),
    ("punct_le_10pct", "len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) * 10 <= length(text)"),
    ("has_digits", "regexp_matches(text, '[0-9]')"),
    ("mean_tok_le_12", "length(text) <= 12 * len(string_split(lower(text), ' '))"),
)


@register(
    "kr20_gate_reliability",
    f"""
    WITH flags AS (
        SELECT {", ".join(f"CAST({expr} AS INT) AS g{i}" for i, (_, expr) in enumerate(_KR_GATES_SQL))}
        FROM documents
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               {", ".join(f"CAST(sum(g{i}) AS BIGINT) AS c{i}" for i in range(len(_KR_GATES_SQL)))},
               CAST(sum({" + ".join(f"g{i}" for i in range(len(_KR_GATES_SQL)))}) AS BIGINT) AS st,
               CAST(sum(({" + ".join(f"g{i}" for i in range(len(_KR_GATES_SQL)))})
                        * ({" + ".join(f"g{i}" for i in range(len(_KR_GATES_SQL)))})) AS BIGINT) AS stt
        FROM flags
    ),
    items AS (
        {" UNION ALL ".join(
            f"SELECT '{name}' AS item, c{i} AS n_pass FROM tot"
            for i, (name, _) in enumerate(_KR_GATES_SQL)
        )}
    )
    SELECT i.item, i.n_pass,
           round(CAST(i.n_pass AS DOUBLE) / t.n, 4) AS difficulty,
           round(({len(_KR_GATES_SQL)}.0 / {len(_KR_GATES_SQL) - 1})
                 * (1.0 - CAST(({" + ".join(f"c{i} * (t.n - c{i})" for i in range(len(_KR_GATES_SQL)))}) AS DOUBLE)
                          / CAST(t.n * t.stt - t.st * t.st AS DOUBLE)), 5) AS kr20
    FROM items i CROSS JOIN tot t
    """,
    tags=("X-kr20",),
)
def kr20_gate_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KR-20 internal-consistency reliability (Kuder & Richardson 1937 —
    Cronbach's alpha for binary items) of a 4-gate quality battery:
    do the gates measure one underlying "document quality" trait
    (alpha near 1) or unrelated things (near 0, negative if gates
    anti-correlate)? This is the audit that says whether combining gate
    flags into one composite score is statistically defensible — the
    measurement-theory complement to the kappa agreement family
    (cohens_kappa, fleiss_kappa score RATERS; KR-20 scores the ITEMS).

    alpha = k/(k-1) * (1 - sum_i p_i q_i / var(total)) reduces entirely
    to integer counts: sum_i c_i(n - c_i) over n*stt - st^2 — ONE
    integer ratio, no float accumulation (the gates themselves are
    integer comparisons). Emits one row per item with its difficulty
    and the constant battery alpha. Distributed shape: one scan with
    all four gates fused into the projection, one scalar moment row."""
    docs = table(spark, sf_dir, "documents")
    text = F.col("text")
    wcount = F.size(F.split(F.lower(text), " "))
    gates = [
        ("len_ge_64", (wcount >= 64)),
        ("punct_le_10pct", (F.regexp_count(text, F.lit("[^a-zA-Z0-9 ]")) * 10 <= F.length(text))),
        ("has_digits", text.rlike("[0-9]")),
        ("mean_tok_le_12", (F.length(text) <= 12 * wcount)),
    ]
    k = len(gates)
    flags = docs.select(
        *[g.cast("int").alias(f"g{i}") for i, (_, g) in enumerate(gates)]
    )
    t = sum(F.col(f"g{i}") for i in range(k))
    tot = flags.agg(
        F.count("*").cast("long").alias("n"),
        *[F.sum(f"g{i}").cast("long").alias(f"c{i}") for i in range(k)],
        F.sum(t).cast("long").alias("st"),
        F.sum(t * t).cast("long").alias("stt"),
    )
    items = None
    for i, (name, _) in enumerate(gates):
        row = tot.select(
            F.lit(name).alias("item"), F.col(f"c{i}").alias("n_pass"), "n", "st", "stt",
            *[F.col(f"c{j}") for j in range(k)],
        )
        items = row if items is None else items.unionByName(row)
    pq_num = sum(F.col(f"c{i}") * (F.col("n") - F.col(f"c{i}")) for i in range(k))
    var_num = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    return items.select(
        "item",
        "n_pass",
        F.round(F.col("n_pass").cast("double") / F.col("n"), 4).alias("difficulty"),
        F.round(
            (float(k) / (k - 1))
            * (1.0 - pq_num.cast("double") / var_num.cast("double")),
            5,
        ).alias("kr20"),
    )


# ---------------------------------------------------------------------------
# Wald SPRT over the click/view event stream (Wald 1945)
# ---------------------------------------------------------------------------

_SPRT_P0 = 0.5
_SPRT_P1 = 0.55
_SPRT_ALPHA = 0.05  # = beta; boundaries +-ln(19)
_SPRT_SCALE = 1_000_000_000

_SPRT_I1 = round(__import__("math").log(_SPRT_P1 / _SPRT_P0) * _SPRT_SCALE)
_SPRT_I0 = round(__import__("math").log((1 - _SPRT_P1) / (1 - _SPRT_P0)) * _SPRT_SCALE)
_SPRT_A = round(__import__("math").log((1 - _SPRT_ALPHA) / _SPRT_ALPHA) * _SPRT_SCALE)


@register(
    "ab_sequential_sprt",
    f"""
    WITH ev AS (
        SELECT ts::DATE AS day, ts, event_id,
               CASE WHEN event_type = 'click' THEN {_SPRT_I1}
                    ELSE {_SPRT_I0} END AS inc
        FROM events WHERE event_type IN ('click', 'view')
    ),
    day_sums AS (
        SELECT day, CAST(sum(inc) AS BIGINT) AS day_inc,
               CAST(count(*) AS BIGINT) AS day_n
        FROM ev GROUP BY 1
    ),
    day_off AS (
        SELECT day,
               sum(day_inc) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   - day_inc AS off
        FROM day_sums
    ),
    cum AS (
        SELECT e.ts, e.event_id,
               o.off + sum(e.inc) OVER (PARTITION BY e.day
                                        ORDER BY e.ts, e.event_id
                                        ROWS UNBOUNDED PRECEDING) AS llr
        FROM ev e JOIN day_off o USING (day)
    ),
    crossing AS (
        SELECT ts, event_id, llr,
               CASE WHEN llr >= {_SPRT_A} THEN 'accept_h1'
                    ELSE 'accept_h0' END AS side
        FROM cum WHERE llr >= {_SPRT_A} OR llr <= -{_SPRT_A}
        ORDER BY ts, event_id LIMIT 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(inc) AS BIGINT) AS final
        FROM ev
    )
    SELECT t.n_events,
           round(CAST(t.final AS DOUBLE) / {_SPRT_SCALE}, 6) AS final_llr,
           COALESCE(c.side, 'continue') AS decision,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS crossed_at,
           round(CAST(c.llr AS DOUBLE) / {_SPRT_SCALE}, 6) AS llr_at_crossing
    FROM tot t LEFT JOIN crossing c ON TRUE
    """,
    tags=("X-sprt",),
)
def ab_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test (Wald 1945) on the
    click-vs-view stream: H0 p(click) = {_SPRT_P0} against H1 =
    {_SPRT_P1}, alpha = beta = {_SPRT_ALPHA} (boundaries +-ln 19). Where
    ab_test_welch_t waits for the fixed horizon, the SPRT reads the
    stream in order and reports the FIRST boundary crossing — the
    always-valid monitoring shape dashboards actually need, and the
    batch analog of a Structured Streaming monitor.

    The log-likelihood increments are nano-unit INTEGER constants, so
    the running LLR is exact integer arithmetic; the cumulative sum is
    HIERARCHICAL — day-level partial sums, a day-grid offset window,
    then within-day windows partitioned BY DAY — so no global
    data-grain window exists (the sweepline/time-spine scale shape).
    The crossing is the (ts, event_id)-minimal row past either
    boundary, found by a day-bounded ordered limit."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    ev = ev.select(
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", F.lit(_SPRT_I1))
        .otherwise(F.lit(_SPRT_I0))
        .alias("inc"),
    )
    ev = truncate_lineage(ev, eager=False)
    day_sums = ev.groupBy("day").agg(F.sum("inc").cast("long").alias("day_inc"))
    w_d = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    day_off = day_sums.select(
        "day", (F.sum("day_inc").over(w_d) - F.col("day_inc")).alias("off")
    )
    w_in = (
        Window.partitionBy("day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ev.join(F.broadcast(day_off), "day").select(
        "ts",
        "event_id",
        (F.col("off") + F.sum("inc").over(w_in)).alias("llr"),
    )
    crossing = (
        cum.filter((F.col("llr") >= _SPRT_A) | (F.col("llr") <= -_SPRT_A))
        .orderBy("ts", "event_id")
        .limit(1)
        .select(
            "ts",
            "llr",
            F.when(F.col("llr") >= _SPRT_A, "accept_h1")
            .otherwise("accept_h0")
            .alias("side"),
        )
    )
    tot = ev.agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("inc").cast("long").alias("final"),
    )
    return tot.join(crossing, F.lit(True), "left").select(
        "n_events",
        F.round(F.col("final").cast("double") / _SPRT_SCALE, 6).alias("final_llr"),
        F.coalesce(F.col("side"), F.lit("continue")).alias("decision"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("crossed_at"),
        F.round(F.col("llr").cast("double") / _SPRT_SCALE, 6).alias(
            "llr_at_crossing"
        ),
    )


# ---------------------------------------------------------------------------
# McNemar's test for paired gate disagreement (McNemar 1947)
# ---------------------------------------------------------------------------


@register(
    "mcnemar_gate_disagreement",
    """
    WITH flags AS (
        SELECT (len(string_split(lower(text), ' ')) >= 64) AS gate_len,
               (len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) * 10
                <= length(text)) AS gate_punct
        FROM documents
    ),
    cells AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN gate_len AND gate_punct THEN 1 END) AS BIGINT) AS both_pass,
               CAST(count(CASE WHEN gate_len AND NOT gate_punct THEN 1 END) AS BIGINT) AS len_only,
               CAST(count(CASE WHEN NOT gate_len AND gate_punct THEN 1 END) AS BIGINT) AS punct_only,
               CAST(count(CASE WHEN NOT gate_len AND NOT gate_punct THEN 1 END) AS BIGINT) AS neither
        FROM flags
    )
    SELECT n, both_pass, len_only, punct_only, neither,
           CASE WHEN len_only + punct_only > 0
                THEN round(CAST((len_only - punct_only) * (len_only - punct_only)
                                AS DOUBLE) / (len_only + punct_only), 5)
           END AS chi2,
           CASE WHEN len_only + punct_only > 0
                THEN round(CAST((abs(len_only - punct_only) - 1)
                                * (abs(len_only - punct_only) - 1)
                                AS DOUBLE) / (len_only + punct_only), 5)
           END AS chi2_corrected
    FROM cells
    """,
    tags=("X-mcnemar",),
)
def mcnemar_gate_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (McNemar 1947) on the paired length-gate vs
    punctuation-gate decisions per document: the discordant cells
    (len-only, punct-only) carry ALL the information about whether the
    two gates disagree systematically — the marginal-homogeneity audit
    for swapping one gate for another in a curation pipeline, and the
    paired-binary member of the test family (chi2 = independence,
    McNemar = marginal change on the SAME units). Both the raw
    (b-c)^2/(b+c) and the Edwards continuity-corrected form are emitted;
    both are pure integer ratios. One scan, one scalar row."""
    docs = table(spark, sf_dir, "documents")
    text = F.col("text")
    gate_len = F.size(F.split(F.lower(text), " ")) >= 64
    gate_punct = F.regexp_count(text, F.lit("[^a-zA-Z0-9 ]")) * 10 <= F.length(text)
    cells = docs.select(
        gate_len.alias("gl"), gate_punct.alias("gp")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.count(F.when(F.col("gl") & F.col("gp"), 1)).cast("long").alias("both_pass"),
        F.count(F.when(F.col("gl") & ~F.col("gp"), 1)).cast("long").alias("len_only"),
        F.count(F.when(~F.col("gl") & F.col("gp"), 1)).cast("long").alias("punct_only"),
        F.count(F.when(~F.col("gl") & ~F.col("gp"), 1)).cast("long").alias("neither"),
    )
    b, c = F.col("len_only"), F.col("punct_only")
    return cells.select(
        "n",
        "both_pass",
        "len_only",
        "punct_only",
        "neither",
        F.when(
            b + c > 0, F.round(((b - c) * (b - c)).cast("double") / (b + c), 5)
        ).alias("chi2"),
        F.when(
            b + c > 0,
            F.round(
                ((F.abs(b - c) - 1) * (F.abs(b - c) - 1)).cast("double") / (b + c),
                5,
            ),
        ).alias("chi2_corrected"),
    )
