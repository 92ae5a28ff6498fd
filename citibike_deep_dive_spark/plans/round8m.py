"""Round-8 continuation batch 11: trainable models in the engine and
their error audits — a multinomial Naive Bayes language classifier
trained on half the corpus and confusion-evaluated on the other half
(the first TRAINED model in the catalog: language_confusion_matrix
evaluates a fixed heuristic, this one learns its parameters from data),
one exact EM step of a two-component Gaussian mixture over document
lengths (the mixture-model family member: histograms describe one mode,
the EM step separates short-form from long-form populations), kNN
label-error candidates in the confident-learning style (Northcutt et
al. 2021 — per-example suspected mislabels, the actionable complement
to knn_shapley_values' negative valuations), a hash-seeded
randomization test for the mean-length difference between two sources
(the exact-inference member of the testing family — no normality
assumption, unlike Welch; no rank reduction, unlike Mann-Whitney),
TextRank keyword extraction (Mihalcea & Tarau 2004 — weighted PageRank
on the token co-occurrence graph, scoring terms raw frequency and even
HITS cannot: centrality within the co-occurrence topology), and the
IVF-shortlist variant of KNN-Shapley — the production substrate swap
the brute-force query's docstring promises, implemented.

Engine-exactness: NB scores and TextRank contributions become micro-nat
integers per token/edge BEFORE summation (argmax/top-k then tie-break
on exact integers); EM responsibilities round at 6dp before re-entering
exact weighted sums; the randomization test's group assignment is the
shared portable md5 hash, so both engines flip identical coins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from ..functions.portable import portable_hash64, portable_hash64_sql
from .catalog import register, table

# ---------------------------------------------------------------------------
# Multinomial Naive Bayes language classifier (train even / eval odd)
# ---------------------------------------------------------------------------


def _nb_oracle() -> str:
    return """
    WITH toks AS (
        SELECT doc_id, lang, doc_id % 2 = 0 AS is_train,
               unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM toks),
    cls AS (  -- per-language token totals + doc priors from the train half
        -- (a language with no train docs cannot be a candidate: ln(0) prior)
        SELECT lang,
               CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT) AS tl,
               CAST(count(DISTINCT CASE WHEN is_train THEN doc_id END) AS BIGINT)
                   AS dl
        FROM toks GROUP BY 1
        HAVING count(DISTINCT CASE WHEN is_train THEN doc_id END) > 0
    ),
    tot AS (SELECT CAST(sum(dl) AS BIGINT) AS d FROM cls),
    wc AS (  -- train-half per (lang, tok) counts
        SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
        FROM toks WHERE is_train GROUP BY 1, 2
    ),
    test_tok AS (
        SELECT doc_id, lang AS true_lang, tok, CAST(count(*) AS BIGINT) AS n
        FROM toks WHERE NOT is_train GROUP BY 1, 2, 3
    ),
    scored AS (  -- per (test doc, candidate lang) micro-nat log-likelihood
        SELECT t.doc_id, t.true_lang, k.lang AS cand,
               CAST(sum(CAST(round(1000000.0 * t.n
                    * ln((coalesce(w.c, 0) + 1.0) / (k.tl + v.v)))
                    AS BIGINT)) AS BIGINT)
               + CAST(max(CAST(round(1000000.0 * ln(CAST(k.dl AS DOUBLE) / x.d))
                    AS BIGINT)) AS BIGINT) AS score_mu
        FROM test_tok t
        CROSS JOIN cls k
        CROSS JOIN vocab v
        CROSS JOIN tot x
        LEFT JOIN wc w ON w.lang = k.lang AND w.tok = t.tok
        GROUP BY 1, 2, 3
    ),
    pred AS (
        SELECT doc_id, true_lang, cand AS pred_lang FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY score_mu DESC, cand) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    conf AS (
        SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY 1, 2
    ),
    acc AS (
        SELECT round(sum(CASE WHEN true_lang = pred_lang THEN n_docs ELSE 0 END)
                     / CAST(sum(n_docs) AS DOUBLE), 4) AS accuracy
        FROM conf
    )
    SELECT true_lang, pred_lang, n_docs, acc.accuracy
    FROM conf CROSS JOIN acc
    """


@register("naive_bayes_lang_classifier", _nb_oracle(), tags=("X-naive-bayes",))
def naive_bayes_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier trained on the even
    doc_ids (+1 Laplace smoothing over the shared vocabulary, document-
    frequency priors) and confusion-evaluated on the odd half — the
    catalog's first TRAINED model: language_confusion_matrix grades a
    fixed n-gram heuristic, this learns P(token | lang) from data the
    way a fastText-style quality/language gate would before filtering a
    crawl. Output is the test-half confusion matrix with overall
    accuracy on every row.

    Exactness: each token's log-likelihood contribution n * ln((c+1) /
    (T_l + V)) becomes a micro-nat INTEGER before the per-document sum,
    so the argmax compares exact integers (candidate-language tiebreak)
    — no cross-engine double-sum ordering can flip a prediction.
    Distributed shape: one (lang, tok) count aggregation on the train
    half, test docs join the |langs| x |vocab| model (Heaps-bounded,
    broadcast-able) via a left join on the token, one argmax window at
    document grain, one confusion rollup."""
    docs = table(spark, sf_dir, "documents")
    toks = truncate_lineage(
        docs.select(
            "doc_id",
            "lang",
            (F.col("doc_id") % 2 == 0).alias("is_train"),
            F.explode(F.split(F.lower("text"), " ")).alias("tok"),
        ),
        eager=False,
    )  # vocab, class totals, train counts, and test counts all read it
    vocab = toks.agg(F.count_distinct("tok").cast("long").alias("v"))
    cls = (
        toks.groupBy("lang")
        .agg(
            F.sum(F.col("is_train").cast("long")).cast("long").alias("tl"),
            F.count_distinct(F.when(F.col("is_train"), F.col("doc_id")))
            .cast("long")
            .alias("dl"),
        )
        .filter(F.col("dl") > 0)  # no-train-doc languages cannot be candidates
    )
    tot = cls.agg(F.sum("dl").cast("long").alias("d"))
    wc = (
        toks.filter("is_train")
        .groupBy("lang", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    test_tok = (
        toks.filter(~F.col("is_train"))
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "tok")
        .agg(F.count("*").cast("long").alias("n"))
    )
    cand = cls.crossJoin(F.broadcast(vocab)).crossJoin(F.broadcast(tot))
    j = test_tok.crossJoin(F.broadcast(cand.select("lang", "tl", "dl", "v", "d"))).join(
        wc.select(F.col("lang"), F.col("tok"), F.col("c")),
        ["lang", "tok"],
        "left",
    )
    tok_mu = F.round(
        1000000.0
        * F.col("n")
        * F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("tl") + F.col("v"))
        ),
        0,
    ).cast("long")
    prior_mu = F.round(
        1000000.0 * F.log(F.col("dl").cast("double") / F.col("d")), 0
    ).cast("long")
    scored = j.groupBy("doc_id", "true_lang", F.col("lang").alias("cand")).agg(
        (F.sum(tok_mu) + F.max(prior_mu)).cast("long").alias("score_mu")
    )
    pred = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("score_mu"), "cand")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("true_lang", F.col("cand").alias("pred_lang"))
    )
    conf = pred.groupBy("true_lang", "pred_lang").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    conf = truncate_lineage(conf, eager=False)  # accuracy re-aggregates it
    acc = conf.agg(
        F.round(
            F.sum(
                F.when(F.col("true_lang") == F.col("pred_lang"), F.col("n_docs"))
                .otherwise(0)
            )
            / F.sum("n_docs").cast("double"),
            4,
        ).alias("accuracy")
    )
    return conf.crossJoin(F.broadcast(acc))


# ---------------------------------------------------------------------------
# One EM step of a 2-component Gaussian mixture over document lengths
# ---------------------------------------------------------------------------


def _gmm_oracle() -> str:
    return """
    WITH lens AS (
        SELECT n_chars AS x, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1
    ),
    init AS (
        SELECT CAST(min(x) AS DOUBLE) AS lo, CAST(max(x) AS DOUBLE) AS hi
        FROM lens
    ),
    params AS (
        SELECT lo + (hi - lo) / 4 AS mu1, lo + 3 * (hi - lo) / 4 AS mu2,
               (hi - lo) / 4 AS sigma
        FROM init
    ),
    resp AS (  -- E-step: responsibility of component 2, rounded 6dp
        SELECT l.x, l.c,
               CAST(round(1000000 * (
                   exp(-(l.x - p.mu2) * (l.x - p.mu2) / (2 * p.sigma * p.sigma))
                   / (exp(-(l.x - p.mu1) * (l.x - p.mu1) / (2 * p.sigma * p.sigma))
                    + exp(-(l.x - p.mu2) * (l.x - p.mu2) / (2 * p.sigma * p.sigma)))
               )) AS BIGINT) AS r2_mu
        FROM lens l CROSS JOIN params p
    ),
    msums AS (  -- M-step moments, exact integer accumulation
        SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(c * r2_mu) AS HUGEINT) AS n2_mu,
               CAST(sum(c * (1000000 - r2_mu)) AS HUGEINT) AS n1_mu,
               CAST(sum(CAST(c AS HUGEINT) * r2_mu * x) AS HUGEINT) AS sx2,
               CAST(sum(CAST(c AS HUGEINT) * (1000000 - r2_mu) * x) AS HUGEINT) AS sx1,
               CAST(sum(CAST(c AS HUGEINT) * r2_mu * x * x) AS HUGEINT) AS sxx2,
               CAST(sum(CAST(c AS HUGEINT) * (1000000 - r2_mu) * x * x) AS HUGEINT)
                   AS sxx1
        FROM resp
    )
    SELECT CAST(1 AS INTEGER) AS component,
           round(CAST(n1_mu AS DOUBLE) / (1000000.0 * n), 6) AS weight,
           round(CAST(sx1 AS DOUBLE) / CAST(n1_mu AS DOUBLE), 4) AS mu,
           round(sqrt(CAST(sxx1 AS DOUBLE) / CAST(n1_mu AS DOUBLE)
                 - (CAST(sx1 AS DOUBLE) / CAST(n1_mu AS DOUBLE))
                   * (CAST(sx1 AS DOUBLE) / CAST(n1_mu AS DOUBLE))), 4) AS sigma
    FROM msums
    UNION ALL
    SELECT CAST(2 AS INTEGER),
           round(CAST(n2_mu AS DOUBLE) / (1000000.0 * n), 6),
           round(CAST(sx2 AS DOUBLE) / CAST(n2_mu AS DOUBLE), 4),
           round(sqrt(CAST(sxx2 AS DOUBLE) / CAST(n2_mu AS DOUBLE)
                 - (CAST(sx2 AS DOUBLE) / CAST(n2_mu AS DOUBLE))
                   * (CAST(sx2 AS DOUBLE) / CAST(n2_mu AS DOUBLE))), 4)
    FROM msums
    """


@register("gmm_em_step_lengths", _gmm_oracle(), tags=("X-gmm-em",))
def gmm_em_step_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact EM step of a two-component Gaussian mixture over
    document lengths, from a deterministic quartile-anchored start
    (mu at 1/4 and 3/4 of the range, shared sigma = range/4, equal
    weights) — the mixture-model member of the distribution family:
    equi-depth histograms and percentiles DESCRIBE the length
    distribution, the EM step SEPARATES it into the short-form/long-form
    populations a chunking or packing policy would treat differently
    (the updated weights say how big each population is, the updated
    mus where they sit). The shared-sigma start makes the E-step a
    logistic in x — responsibilities are monotone, so the step is the
    textbook soft version of a threshold split (gini_split_scan is the
    hard version).

    Exactness: the E-step runs on the LENGTH-SUPPORT grain (distinct
    n_chars, count) — responsibilities round to micro-unit integers per
    support point, and every M-step moment is an exact
    HUGEINT/decimal integer sum; the published weight/mu/sigma are
    three rounded ratios. Distributed shape: one support aggregation
    (bounded by the length range at any corpus size), one broadcast
    scalar frame of init params, one scalar M-step rollup."""
    docs = table(spark, sf_dir, "documents")
    lens = truncate_lineage(
        docs.groupBy(F.col("n_chars").alias("x")).agg(
            F.count("*").cast("long").alias("c")
        ),
        eager=False,
    )  # init scan + E-step both read it
    init = lens.agg(
        F.min("x").cast("double").alias("lo"), F.max("x").cast("double").alias("hi")
    )
    params = init.select(
        (F.col("lo") + (F.col("hi") - F.col("lo")) / 4).alias("mu1"),
        (F.col("lo") + 3 * (F.col("hi") - F.col("lo")) / 4).alias("mu2"),
        ((F.col("hi") - F.col("lo")) / 4).alias("sigma"),
    )
    x = F.col("x").cast("double")
    g1 = F.exp(-(x - F.col("mu1")) * (x - F.col("mu1")) / (2 * F.col("sigma") * F.col("sigma")))
    g2 = F.exp(-(x - F.col("mu2")) * (x - F.col("mu2")) / (2 * F.col("sigma") * F.col("sigma")))
    resp = lens.crossJoin(F.broadcast(params)).select(
        "x",
        "c",
        F.round(1000000 * (g2 / (g1 + g2)), 0).cast("long").alias("r2_mu"),
    )
    dc = F.col("c").cast("decimal(38,0)")
    m = resp.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(dc * F.col("r2_mu")).alias("n2_mu"),
        F.sum(dc * (1000000 - F.col("r2_mu"))).alias("n1_mu"),
        F.sum(dc * F.col("r2_mu") * F.col("x")).alias("sx2"),
        F.sum(dc * (1000000 - F.col("r2_mu")) * F.col("x")).alias("sx1"),
        F.sum(dc * F.col("r2_mu") * F.col("x") * F.col("x")).alias("sxx2"),
        F.sum(dc * (1000000 - F.col("r2_mu")) * F.col("x") * F.col("x")).alias("sxx1"),
    )
    rows = []
    for comp, nk, sx, sxx in ((1, "n1_mu", "sx1", "sxx1"), (2, "n2_mu", "sx2", "sxx2")):
        nkd = F.col(nk).cast("double")
        sxd = F.col(sx).cast("double")
        sxxd = F.col(sxx).cast("double")
        rows.append(
            m.select(
                F.lit(comp).cast("int").alias("component"),
                F.round(nkd / (1000000.0 * F.col("n")), 6).alias("weight"),
                F.round(sxd / nkd, 4).alias("mu"),
                F.round(
                    F.sqrt(sxxd / nkd - (sxd / nkd) * (sxd / nkd)), 4
                ).alias("sigma"),
            )
        )
    return rows[0].unionByName(rows[1])


# ---------------------------------------------------------------------------
# kNN label-error candidates (confident-learning style)
# ---------------------------------------------------------------------------

_CL_K = 5
_CL_MIN_VOTES = 3  # strict majority of the 5 neighbors


def _label_error_oracle() -> str:
    from .training import _cos_sql, _kmeans_cte

    cos = _cos_sql("ea.embedding", "eb.embedding")
    return (
        _kmeans_cte(8, 3)
        + f""",
    assigned AS (
        SELECT b.vec_id, b.label, b.embedding, f.cell
        FROM embeddings b JOIN final f ON b.vec_id = f.id
    ),
    knn AS (
        SELECT * FROM (
            SELECT ea.vec_id, ea.label AS true_label, eb.label AS nbr_label,
                   row_number() OVER (PARTITION BY ea.vec_id
                                      ORDER BY {cos} DESC, eb.vec_id) AS rn
            FROM assigned ea JOIN assigned eb
              ON ea.cell = eb.cell AND ea.vec_id <> eb.vec_id
        ) WHERE rn <= {_CL_K}
    ),
    votes AS (
        SELECT vec_id, true_label, nbr_label,
               CAST(count(*) AS BIGINT) AS v
        FROM knn GROUP BY 1, 2, 3
    ),
    top AS (
        SELECT vec_id, true_label, nbr_label AS consensus_label, v FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY v DESC, nbr_label) AS rn
            FROM votes
        ) WHERE rn = 1
    )
    SELECT vec_id, true_label, consensus_label, v AS consensus_votes
    FROM top
    WHERE consensus_label <> true_label AND v >= {_CL_MIN_VOTES}
    ORDER BY vec_id
    """
    )


@register(
    "knn_label_error_candidates", _label_error_oracle(), tags=("X-label-errors",)
)
def knn_label_error_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning-style label-error candidates (Northcutt,
    Jiang & Chuang 2021, kNN-consensus form): vectors whose K=5 nearest
    in-cell neighbors vote by strict majority (>= 3/5) for a DIFFERENT label
    than the one recorded — the per-example mislabel list a curation
    pass reviews before training, and the actionable complement to
    knn_shapley_values (Shapley says an example HURTS the classifier;
    this says WHY: its recorded label disagrees with its neighborhood).
    Neighbors come from the vector's IVF k-means cell — the honest
    production shortlist (cross-LABEL by construction, unlike the
    label-restricted mutual-kNN substrate, which could never see a
    mislabel).

    Votes are exact integer counts; the consensus pick and the
    candidate gate compare integers with label tiebreaks — no doubles
    anywhere past the 4dp-rounded cosine rank (the _cos_sql
    discipline). Distributed shape: the k-means loop, one in-cell pair
    scan (quadratic within a cell, cells ∝ corpus at scale), a
    per-vector top-K rank window, a (vector, label) vote count, one
    argmax window."""
    from ..operators.similarity import _dot, _norm, kmeans

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    e = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    cent = kmeans(emb, k=8, iters=3, fan=False).select(
        "cluster_id", F.col("centroid").alias("m")
    )
    d2raw = F.aggregate(
        F.zip_with("v", "m", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assign = (
        e.crossJoin(F.broadcast(cent))
        .select("id", "cluster_id", F.round(d2raw, 6).alias("r6"))
        .groupBy("id")
        .agg(F.min(F.struct(F.col("r6"), F.col("cluster_id"))).alias("ms"))
        .select("id", F.col("ms.cluster_id").alias("cell"))
    )
    assigned = truncate_lineage(
        emb.join(assign, emb.vec_id == assign.id).select(
            "vec_id",
            "label",
            "embedding",
            "cell",
            _norm(F.col("embedding")).alias("nrm"),
        ),
        eager=False,
    )  # both sides of the in-cell pair scan read it
    a = assigned.alias("a")
    b = assigned.alias("b")
    cs = F.round(
        _dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        4,
    )
    knn = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("a.label").alias("true_label"),
            F.col("b.label").alias("nbr_label"),
            cs.alias("cs"),
            F.col("b.vec_id").alias("nbr_id"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("cs"), "nbr_id")
            ),
        )
        .filter(F.col("rn") <= _CL_K)
    )
    # r14 checkpoint audit: knn feeds ONE chain (votes -> top -> filter)
    # — the old checkpoint paid a K-per-vector write+read inside every
    # single execution and only subsidized warm re-runs of the same df
    # (the 3.3 -> 0.2 s warm it bought was re-execution replay, not
    # plan cost). Dropped; the honest per-execution number includes the
    # in-cell pair scan.
    votes = knn.groupBy("vec_id", "true_label", "nbr_label").agg(
        F.count("*").cast("long").alias("v")
    )
    top = (
        votes.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("v"), "nbr_label")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "true_label",
            F.col("nbr_label").alias("consensus_label"),
            F.col("v").alias("consensus_votes"),
        )
    )
    return top.filter(
        (F.col("consensus_label") != F.col("true_label"))
        & (F.col("consensus_votes") >= _CL_MIN_VOTES)
    )


# ---------------------------------------------------------------------------
# Hash-seeded randomization test for a two-source mean difference
# ---------------------------------------------------------------------------

_PERM_N = 256
_PERM_A = "src0"
_PERM_B = "src1"


def _perm_oracle() -> str:
    h = portable_hash64_sql(f"CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)")
    return f"""
    WITH pool AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x
        FROM documents WHERE source IN ('{_PERM_A}', '{_PERM_B}')
    ),
    obs AS (
        SELECT round(
            sum(CASE WHEN source = '{_PERM_A}' THEN CAST(x AS DOUBLE) END)
              / count(CASE WHEN source = '{_PERM_A}' THEN 1 END)
          - sum(CASE WHEN source = '{_PERM_B}' THEN CAST(x AS DOUBLE) END)
              / count(CASE WHEN source = '{_PERM_B}' THEN 1 END), 9) AS d_obs
        FROM pool
    ),
    perms AS (
        SELECT pool.doc_id, pool.x, g.p,
               {h} % 2 = 0 AS grp_a
        FROM pool CROSS JOIN (
            SELECT unnest(generate_series(1, {_PERM_N})) AS p
        ) g
    ),
    stats AS (
        SELECT p,
               round(sum(CASE WHEN grp_a THEN CAST(x AS DOUBLE) END)
                       / count(CASE WHEN grp_a THEN 1 END)
                   - sum(CASE WHEN NOT grp_a THEN CAST(x AS DOUBLE) END)
                       / count(CASE WHEN NOT grp_a THEN 1 END), 9) AS d
        FROM perms
        GROUP BY 1
        HAVING count(CASE WHEN grp_a THEN 1 END) > 0
           AND count(CASE WHEN NOT grp_a THEN 1 END) > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_perms,
           max(o.d_obs) AS observed_diff,
           CAST(count(CASE WHEN abs(s.d) >= abs(o.d_obs) THEN 1 END) AS BIGINT)
               AS n_extreme,
           round((count(CASE WHEN abs(s.d) >= abs(o.d_obs) THEN 1 END) + 1.0)
                 / (count(*) + 1.0), 5) AS p_value
    FROM stats s CROSS JOIN obs o
    """


@register("randomization_test_mean_diff", _perm_oracle(), tags=("X-perm-test",))
def randomization_test_mean_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-seeded randomization test (Fisher's permutation idea, the
    random-reassignment variant) for the mean document-length
    difference between two sources: 256 deterministic md5 coin-flip
    reassignments of the pooled documents, p-value = (1 + #{|d_perm| >=
    |d_obs|}) / (1 + n) with the add-one correction. The EXACT-inference
    member of the testing family — Welch assumes normality,
    Mann-Whitney reduces to ranks, the bootstrap resamples within
    groups; randomization tests the sharp null directly and its p-value
    is valid at any sample size. Replays identically on both engines
    and across retries because the 'randomness' is the shared portable
    hash of (doc_id, permutation).

    Group means are ratios of exact integer sums rounded at 9dp before
    comparison. Distributed shape: the pooled frame fans out x256 (a
    constant, NOT data-dependent), one (permutation)-grain aggregation
    — map-side combinable, no windows, no joins beyond two broadcast
    scalars."""
    docs = table(spark, sf_dir, "documents")
    pool = truncate_lineage(
        docs.filter(F.col("source").isin(_PERM_A, _PERM_B)).select(
            "doc_id", "source", F.col("n_chars").cast("long").alias("x")
        ),
        eager=False,
    )  # observed stat + the fan-out both read it
    xd = F.col("x").cast("double")
    obs = pool.agg(
        F.round(
            F.sum(F.when(F.col("source") == _PERM_A, xd))
            / F.count(F.when(F.col("source") == _PERM_A, 1))
            - F.sum(F.when(F.col("source") == _PERM_B, xd))
            / F.count(F.when(F.col("source") == _PERM_B, 1)),
            9,
        ).alias("d_obs")
    )
    grid = spark.range(1, _PERM_N + 1).select(F.col("id").cast("int").alias("p"))
    grp_a = (
        portable_hash64(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.col("p").cast("string"))
        )
        % 2
        == 0
    )
    perms = pool.crossJoin(F.broadcast(grid)).select("doc_id", "x", "p", grp_a.alias("grp_a"))
    stats = (
        perms.groupBy("p")
        .agg(
            F.round(
                F.sum(F.when(F.col("grp_a"), xd)) / F.count(F.when(F.col("grp_a"), 1))
                - F.sum(F.when(~F.col("grp_a"), xd))
                / F.count(F.when(~F.col("grp_a"), 1)),
                9,
            ).alias("d"),
            F.count(F.when(F.col("grp_a"), 1)).alias("na"),
            F.count(F.when(~F.col("grp_a"), 1)).alias("nb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
    )
    extreme = F.count(
        F.when(F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1)
    ).cast("long")
    return stats.crossJoin(F.broadcast(obs)).agg(
        F.count("*").cast("long").alias("n_perms"),
        F.max("d_obs").alias("observed_diff"),
        extreme.alias("n_extreme"),
        F.round(
            (extreme + F.lit(1).cast("double")) / (F.count("*") + 1.0), 5
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# TextRank keyword extraction (Mihalcea & Tarau 2004)
# ---------------------------------------------------------------------------

_TR_TOPK = 15
_TR_D = 0.85


def _textrank_oracle() -> str:
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    bi AS (  -- adjacent co-occurrence, both directions
        SELECT ws[i] AS a, ws[i + 1] AS b
        FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
              FROM toks WHERE len(ws) >= 2)
    ),
    edges AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS w FROM (
            SELECT a, b FROM bi UNION ALL SELECT b, a FROM bi
        ) GROUP BY 1, 2
    ),
    wdeg AS (SELECT a AS node, CAST(sum(w) AS BIGINT) AS wd FROM edges GROUP BY 1),
    r1 AS (  -- iteration 1 from r0 = 1: contributions w/W_src, micro-exact
        SELECT e.b AS node,
               CAST(round(1000000.0 * (1 - {_TR_D})) AS BIGINT)
               + CAST(round({_TR_D} * sum(
                     CAST(round(1000000.0 * e.w / d.wd) AS BIGINT)))
                 AS BIGINT) AS r_mu
        FROM edges e JOIN wdeg d ON e.a = d.node
        GROUP BY 1
    ),
    r2 AS (
        SELECT e.b AS node,
               CAST(round(1000000.0 * (1 - {_TR_D})) AS BIGINT)
               + CAST(round({_TR_D} * sum(
                     CAST(round(CAST(e.w AS DOUBLE) * r1.r_mu / d.wd) AS BIGINT)))
                 AS BIGINT) AS r_mu
        FROM edges e
        JOIN wdeg d ON e.a = d.node
        JOIN r1 ON r1.node = e.a
        GROUP BY 1
    )
    SELECT node AS keyword,
           round(r_mu / 1000000.0, 6) AS textrank
    FROM (
        SELECT *, row_number() OVER (ORDER BY r_mu DESC, node) AS rn FROM r2
    ) WHERE rn <= {_TR_TOPK}
    """


@register("textrank_keywords", _textrank_oracle(), tags=("X-textrank",))
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    PageRank over the adjacent-token co-occurrence graph, two unrolled
    iterations from the uniform start with damping 0.85 — scoring terms
    by centrality WITHIN the co-occurrence topology, the signal raw
    frequency (corpus_top_ngrams), df-weighted authority (HITS), and
    association strength (PMI) each miss: a term is a keyword when its
    neighbors are themselves well-connected, whatever its own count.

    Every per-edge contribution w_ij * r_i / W_i becomes a micro-unit
    INTEGER before the neighbor sum (the Adamic-Adar discipline), and
    each iteration's rank is re-quantized to integers before reuse, so
    both engines walk identical values with tie-broken top-k.
    Distributed shape: one bigram explode into a weighted-edge
    aggregation (Heaps-bounded node set), a weighted-degree
    aggregation, two edge-grain join+agg rounds (the bipartite
    power-iteration shape HITS uses), one top-{_TR_TOPK} window."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower("text"), " ").alias("ws")).filter(
        F.size("ws") >= 2
    )
    pairs = F.expr(
        "transform(sequence(1, size(ws) - 1), "
        "i -> struct(element_at(ws, i) AS a, element_at(ws, i + 1) AS b))"
    )
    bi = toks.select(F.explode(pairs).alias("e")).select(
        F.col("e.a").alias("a"), F.col("e.b").alias("b")
    )
    bi = truncate_lineage(bi, eager=False)  # both union directions read it
    edges = (
        bi.unionByName(bi.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("w"))
    )
    edges = truncate_lineage(edges, eager=False)  # degree agg + 2 iterations
    wdeg = edges.groupBy("a").agg(F.sum("w").cast("long").alias("wd"))
    wdeg = truncate_lineage(wdeg, eager=False)  # joined in both iterations
    base_mu = F.lit(int(round(1000000.0 * (1 - _TR_D)))).cast("long")
    r1 = (
        edges.join(wdeg, "a")
        .groupBy(F.col("b").alias("node"))
        .agg(
            (
                base_mu
                + F.round(
                    _TR_D
                    * F.sum(
                        F.round(1000000.0 * F.col("w") / F.col("wd"), 0).cast("long")
                    ),
                    0,
                ).cast("long")
            ).alias("r_mu")
        )
    )
    r2 = (
        edges.join(wdeg, "a")
        .join(r1.select(F.col("node").alias("a"), "r_mu"), "a")
        .groupBy(F.col("b").alias("node"))
        .agg(
            (
                base_mu
                + F.round(
                    _TR_D
                    * F.sum(
                        F.round(
                            F.col("w").cast("double") * F.col("r_mu") / F.col("wd"),
                            0,
                        ).cast("long")
                    ),
                    0,
                ).cast("long")
            ).alias("r_mu")
        )
    )
    return (
        r2.withColumn("rn", F.row_number().over(Window.orderBy(F.desc("r_mu"), "node")))
        .filter(F.col("rn") <= _TR_TOPK)
        .select(
            F.col("node").alias("keyword"),
            F.round(F.col("r_mu") / 1000000.0, 6).alias("textrank"),
        )
    )


# ---------------------------------------------------------------------------
# KNN-Shapley on the IVF shortlist — the production substrate swap
# ---------------------------------------------------------------------------


def _shapley_ivf_oracle() -> str:
    from .round8l import _SHAP_K, _SHAP_QMOD
    from .training import _cos_sql, _kmeans_cte

    cos = _cos_sql("q.embedding", "c.embedding")
    return (
        _kmeans_cte(8, 3)
        + f""",
    q AS (
        SELECT b.vec_id AS qid, b.label AS qlabel, b.embedding, f.cell
        FROM embeddings b JOIN final f ON b.vec_id = f.id
        WHERE b.vec_id % {_SHAP_QMOD} = 0
    ),
    c AS (
        SELECT b.vec_id AS cid, b.label AS clabel, b.embedding, f.cell
        FROM embeddings b JOIN final f ON b.vec_id = f.id
        WHERE b.vec_id % {_SHAP_QMOD} <> 0
    ),
    ranked AS (
        SELECT q.qid, c.cid, c.clabel,
               CASE WHEN c.clabel = q.qlabel THEN 1 ELSE 0 END AS hit,
               row_number() OVER (PARTITION BY q.qid
                                  ORDER BY {cos} DESC, c.cid) AS rn
        FROM q JOIN c ON q.cell = c.cell
    ),
    counted AS (
        SELECT qid, cid, clabel, hit, rn,
               CAST(count(*) OVER (PARTITION BY qid) AS BIGINT) AS n
        FROM ranked
    ),
    sized AS (
        SELECT qid, cid, clabel, hit, rn, n,
               CAST(max(CASE WHEN rn = n THEN hit END)
                    OVER (PARTITION BY qid) AS BIGINT) AS hit_last
        FROM counted
    ),
    terms AS (
        SELECT qid, cid, clabel, rn, n, hit_last,
               CAST(coalesce(CASE WHEN rn < n THEN
                   CAST(round(1000000000.0
                        * (hit - lead(hit) OVER (PARTITION BY qid ORDER BY rn))
                        * least({_SHAP_K}, rn)
                        / ({_SHAP_K}.0 * rn)) AS BIGINT)
               END, 0) AS BIGINT) AS t_mu
        FROM sized
    ),
    svals AS (
        SELECT qid, cid, clabel,
               CAST(round(1000000000.0 * hit_last / n) AS BIGINT)
               + CAST(sum(t_mu) OVER (PARTITION BY qid ORDER BY rn
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS BIGINT) AS s_mu
        FROM terms
    ),
    agg AS (
        SELECT cid, clabel, CAST(count(*) AS BIGINT) AS n_queries,
               CAST(sum(s_mu) AS BIGINT) AS sum_mu
        FROM svals GROUP BY 1, 2
    )
    SELECT cid AS vec_id, clabel AS label, n_queries,
           round(CAST(sum_mu AS DOUBLE) / (1000000000.0 * n_queries), 6)
               AS mean_shapley,
           CAST(row_number() OVER (ORDER BY sum_mu DESC, cid) AS BIGINT) AS rank
    FROM agg
    """
    )


@register("knn_shapley_ivf_shortlist", _shapley_ivf_oracle(), tags=("X-knn-shapley",))
def knn_shapley_ivf_shortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN-Shapley on the IVF shortlist — the production substrate swap
    knn_shapley_values' docstring promises, implemented: each held-out
    query values only the corpus vectors in its OWN k-means cell (the
    IVF nprobe=1 shortlist), so the pair scan is cell-restricted —
    quadratic within a cell, linear across cells-proportional-to-corpus
    — instead of the exact query's full query x corpus product. Corpus
    vectors outside every query's cell receive no row (valuation needs
    a ranking; the shortlist never ranked them), exactly how an
    IVF-backed valuation behaves in production; n_queries per vector
    counts the queries that DID rank it.

    Same telescoped micro-integer suffix-sum algebra as the exact form
    (window-only between the checkpointed rank frame and the rollup);
    the assignment reuses the kmeans oracle's rounded+tiebroken argmin
    so cell membership is bit-identical on both engines."""
    from ..operators.similarity import _dot, _norm, kmeans
    from .round8l import _SHAP_K, _SHAP_QMOD

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    e = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    cent = kmeans(emb, k=8, iters=3, fan=False).select(
        "cluster_id", F.col("centroid").alias("m")
    )
    d2raw = F.aggregate(
        F.zip_with("v", "m", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assign = (
        e.crossJoin(F.broadcast(cent))
        .select("id", "cluster_id", F.round(d2raw, 6).alias("r6"))
        .groupBy("id")
        .agg(F.min(F.struct(F.col("r6"), F.col("cluster_id"))).alias("ms"))
        .select("id", F.col("ms.cluster_id").alias("cell"))
    )
    tagged = truncate_lineage(
        emb.join(assign, emb.vec_id == assign.id).select(
            "vec_id", "label", "embedding", "cell", _norm(F.col("embedding")).alias("nrm")
        ),
        eager=False,
    )  # query and corpus halves both read it
    q = tagged.filter(F.col("vec_id") % _SHAP_QMOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("qnorm"),
        F.col("cell"),
    )
    c = tagged.filter(F.col("vec_id") % _SHAP_QMOD != 0).select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clabel"),
        F.col("embedding").alias("cemb"),
        F.col("nrm").alias("cnorm"),
        F.col("cell").alias("ccell"),
    )
    cos = F.round(
        _dot(F.col("qemb"), F.col("cemb")) / (F.col("qnorm") * F.col("cnorm")), 4
    )
    # r14 checkpoint audit: single window-chain consumer (same as
    # knn_shapley_values) — checkpoint dropped.
    ranked = (
        c.join(F.broadcast(q), F.col("cell") == F.col("ccell"))
        .select(
            "qid",
            "cid",
            "clabel",
            (F.col("clabel") == F.col("qlabel")).cast("int").alias("hit"),
            cos.alias("cs"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("cs"), "cid")
            ),
        )
        .drop("cs")
    )
    wq = Window.partitionBy("qid").orderBy("rn")
    wall = Window.partitionBy("qid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sized = ranked.select(
        "qid",
        "cid",
        "clabel",
        "rn",
        "hit",
        F.count("*").over(wall).cast("long").alias("n"),
        F.max(F.struct("rn", "hit")).over(wall).getField("hit")
        .cast("long")
        .alias("hit_last"),
    )
    t_mu = F.when(
        F.col("rn") < F.col("n"),
        F.round(
            1000000000.0
            * (F.col("hit") - F.lead("hit").over(wq))
            * F.least(F.lit(_SHAP_K), F.col("rn"))
            / (float(_SHAP_K) * F.col("rn")),
            0,
        ).cast("long"),
    )
    terms = sized.select(
        "qid",
        "cid",
        "clabel",
        "rn",
        F.coalesce(t_mu, F.lit(0)).alias("t_mu"),
        F.round(1000000000.0 * F.col("hit_last") / F.col("n"), 0)
        .cast("long")
        .alias("base_mu"),
    )
    prefix = F.sum("t_mu").over(
        wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ).cast("long")
    total_mu = F.sum("t_mu").over(wall).cast("long")
    svals = terms.select(
        "qid",
        "cid",
        "clabel",
        (F.col("base_mu") + total_mu - prefix + F.col("t_mu")).alias("s_mu"),
    )
    agg = svals.groupBy("cid", "clabel").agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum("s_mu").cast("long").alias("sum_mu"),
    )
    return agg.select(
        F.col("cid").alias("vec_id"),
        F.col("clabel").alias("label"),
        "n_queries",
        F.round(
            F.col("sum_mu").cast("double") / (1000000000.0 * F.col("n_queries")), 6
        ).alias("mean_shapley"),
        F.row_number()
        .over(Window.orderBy(F.desc("sum_mu"), "cid"))
        .cast("long")
        .alias("rank"),
    )
