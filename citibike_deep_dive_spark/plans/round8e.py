"""Round-8 continuation batch 3: time-series symbolization, multiple-
testing control, rule mining, and graph quality — SAX symbolic
aggregate approximation of the daily event volume (Lin, Keogh, Lonardi
& Chiu 2003), per-source Kolmogorov-Smirnov drift with Benjamini-
Hochberg FDR control (Benjamini & Hochberg 1995) over the source
family, directed association rules with confidence / leverage /
conviction (Agrawal & Srikant 1994; Brin et al. 1997 for conviction),
and Newman-Girvan modularity of the label-propagation communities on
the near-dup graph (Newman & Girvan 2004) — the quality metric for the
existing LPA/CC/k-core community family.

Engine-exactness: the fixed-point discipline throughout — KS distances
and modularity contributions have INTEGER numerators (cross-multiplied
CDFs, e_in*m2 - d_c^2), conviction is a pure integer ratio, and the
only order-sensitive float sum (total modularity) is an integer sum in
disguise, divided once at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table

# ---------------------------------------------------------------------------
# SAX symbolization of the daily event volume (Lin et al. 2003)
# ---------------------------------------------------------------------------

_SAX_SEG_DAYS = 5
# Gaussian equiprobable breakpoints for alphabet size 4
_SAX_BP = (-0.6745, 0.0, 0.6745)


@register(
    "sax_daily_volume_symbols",
    f"""
    WITH daily AS (
        SELECT ts::DATE AS day, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS s,
               CAST(sum(c) AS BIGINT) AS sc,
               CAST(sum(c * c) AS BIGINT) AS scc,
               min(day) AS d0
        FROM daily
    ),
    seg AS (
        SELECT date_diff('day', st.d0, d.day) // {_SAX_SEG_DAYS} AS seg_idx,
               min(d.day) AS seg_start_d,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(d.c) AS BIGINT) AS seg_sum
        FROM daily d CROSS JOIN stats st
        GROUP BY 1
    ),
    paa AS (
        SELECT seg_idx, seg_start_d, n_days,
               (CAST(seg_sum AS DOUBLE) / n_days
                - CAST(st.sc AS DOUBLE) / st.s)
               / sqrt(CAST(st.s * st.scc - st.sc * st.sc AS DOUBLE)
                      / CAST(st.s * (st.s - 1) AS BIGINT)) AS z
        FROM seg CROSS JOIN stats st
    ),
    sym AS (
        SELECT seg_idx, seg_start_d, n_days, z,
               CASE WHEN z < {_SAX_BP[0]} THEN 'a'
                    WHEN z < {_SAX_BP[1]} THEN 'b'
                    WHEN z < {_SAX_BP[2]} THEN 'c'
                    ELSE 'd' END AS symbol
        FROM paa
    )
    SELECT CAST(seg_idx AS INT) AS seg_idx,
           strftime(seg_start_d, '%Y-%m-%d') AS seg_start,
           n_days,
           round(z, 4) AS paa_z,
           symbol,
           lag(symbol, 2) OVER w || lag(symbol, 1) OVER w || symbol AS word3
    FROM sym
    WINDOW w AS (ORDER BY seg_idx)
    """,
    tags=("X-sax",),
)
def sax_daily_volume_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX — Symbolic Aggregate approXimation (Lin et al. 2003) — of the
    daily event-volume series: z-normalize, Piecewise Aggregate
    Approximation over {_SAX_SEG_DAYS}-day segments, then quantize each
    segment mean against the Gaussian equiprobable breakpoints for a
    4-letter alphabet. The trailing 3-symbol word per segment is the
    motif key time-series miners bucket on (NULL for the first two
    segments — the honest ramp-in). SAX is how 100 TB of raw telemetry
    becomes a searchable string corpus: after this transform, motif
    discovery IS the n-gram machinery this catalog already has.

    The z-normalization uses integer moment sums (count/sum/sum-of-
    squares), the PAA mean is an integer-ratio double, and the only
    window is over the SEGMENT grid (series-length / {_SAX_SEG_DAYS}
    rows). Distributed shape: one map-side-combined daily count, one
    segment aggregation, broadcast scalar stats — the raw event grain
    is touched exactly once."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    daily = truncate_lineage(daily, eager=False)
    stats = daily.agg(
        F.count("*").cast("long").alias("s"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
        F.min("day").alias("d0"),
    )
    seg = (
        daily.crossJoin(F.broadcast(stats))
        .groupBy(
            (F.datediff(F.col("day"), F.col("d0")) / _SAX_SEG_DAYS)
            .cast("long")
            .alias("seg_idx")
        )
        .agg(
            F.min("day").alias("seg_start_d"),
            F.count("*").cast("long").alias("n_days"),
            F.sum("c").cast("long").alias("seg_sum"),
        )
    )
    std = F.sqrt(
        (F.col("s") * F.col("scc") - F.col("sc") * F.col("sc")).cast("double")
        / (F.col("s") * (F.col("s") - 1))
    )
    z = (
        F.col("seg_sum").cast("double") / F.col("n_days")
        - F.col("sc").cast("double") / F.col("s")
    ) / std
    sym = seg.crossJoin(F.broadcast(stats)).select(
        "seg_idx",
        "seg_start_d",
        "n_days",
        z.alias("z"),
        F.when(z < _SAX_BP[0], "a")
        .when(z < _SAX_BP[1], "b")
        .when(z < _SAX_BP[2], "c")
        .otherwise("d")
        .alias("symbol"),
    )
    w = Window.orderBy("seg_idx")
    return sym.select(
        F.col("seg_idx").cast("int").alias("seg_idx"),
        F.date_format("seg_start_d", "yyyy-MM-dd").alias("seg_start"),
        "n_days",
        F.round("z", 4).alias("paa_z"),
        "symbol",
        F.concat(
            F.lag("symbol", 2).over(w), F.lag("symbol", 1).over(w), F.col("symbol")
        ).alias("word3"),
    )


# ---------------------------------------------------------------------------
# Per-source KS drift with Benjamini-Hochberg FDR control
# ---------------------------------------------------------------------------

_BH_ALPHA = 0.05


@register(
    "ks_source_bh_fdr",
    f"""
    WITH cells AS (
        SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    grid AS (SELECT v, CAST(sum(c) AS BIGINT) AS c_all FROM cells GROUP BY 1),
    gcum AS (
        SELECT v, sum(c_all) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_all
        FROM grid
    ),
    srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM cells GROUP BY 1),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    dense AS (
        SELECT s.source, g.v, s.n_s, COALESCE(c.c, 0) AS c
        FROM srcs s CROSS JOIN grid g
        LEFT JOIN cells c ON c.source = s.source AND c.v = g.v
    ),
    scum AS (
        SELECT source, v, n_s,
               sum(c) OVER (PARTITION BY source ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum_s
        FROM dense
    ),
    d AS (
        SELECT sc.source, sc.n_s,
               max(abs(sc.cum_s * (n.n - sc.n_s)
                       - (g.cum_all - sc.cum_s) * sc.n_s)) AS d_num
        FROM scum sc JOIN gcum g USING (v) CROSS JOIN n
        GROUP BY 1, 2
    ),
    pv AS (
        SELECT d.source, d.n_s,
               CAST(d.d_num AS DOUBLE) / (d.n_s * (n.n - d.n_s)) AS ks_d,
               least(1.0,
                     2.0 * exp(-2.0
                               * (CAST(d.d_num AS DOUBLE) / (d.n_s * (n.n - d.n_s)))
                               * (CAST(d.d_num AS DOUBLE) / (d.n_s * (n.n - d.n_s)))
                               * (CAST(d.n_s AS DOUBLE) * (n.n - d.n_s) / n.n)))
                   AS p
        FROM d CROSS JOIN n
    ),
    ranked AS (
        SELECT source, n_s, ks_d, p,
               ROW_NUMBER() OVER (ORDER BY p, source) AS rnk,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM pv
    ),
    kstar AS (
        SELECT COALESCE(max(CASE WHEN p * m <= rnk * {_BH_ALPHA}
                                 THEN rnk END), 0) AS k
        FROM ranked
    )
    SELECT source, n_s AS n_docs,
           round(ks_d, 5) AS ks_d,
           round(p, 6) AS p_value,
           CAST(rnk AS BIGINT) AS p_rank,
           round(rnk * {_BH_ALPHA} / m, 6) AS bh_critical,
           rnk <= kstar.k AS rejected
    FROM ranked CROSS JOIN kstar
    """,
    tags=("X-bh-fdr",),
)
def ks_source_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift with family-wise FDR control: an
    exact two-sample KS statistic between each source's document-length
    distribution and the REST of the corpus, an asymptotic p-value
    (p = 2 exp(-2 D^2 n_eff), n_eff = n1*n2/(n1+n2)), and the
    Benjamini-Hochberg 1995 step-up procedure at alpha = {_BH_ALPHA}:
    reject every source ranked at or below the largest k with
    p_(k) <= k*alpha/m. Running 20 drift tests at 0.05 each expects a
    false alarm per audit; BH is the standard correction, and this
    query is the template for any per-slice test family in the catalog
    (KS/MW/chi2 all produce p-values).

    The KS distance has an INTEGER numerator on the zero-filled value
    grid — max |cum_s * N_rest - cum_rest * N_s| (the mannwhitney CDF
    cross-multiplication discipline) — so D is exact; the only
    transcendental is the single exp() per source at the edge. The BH
    comparison p*m <= rank*alpha is the same double expression on both
    engines. Distributed shape: one (source, value) aggregation, a
    (sources x grid) zero-filled frame with per-source running sums —
    grid-grain, corpus-size-free — and a 20-row ranking window."""
    docs = table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").cast("long").alias("c")
    )
    cells = truncate_lineage(cells, eager=False)
    grid = cells.groupBy("v").agg(F.sum("c").cast("long").alias("c_all"))
    w_g = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gcum = grid.select("v", F.sum("c_all").over(w_g).alias("cum_all"))
    srcs = cells.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    n = cells.agg(F.sum("c").cast("long").alias("n"))
    dense = (
        srcs.crossJoin(F.broadcast(grid.select("v")))
        .join(cells, ["source", "v"], "left")
        .select("source", "v", "n_s", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w_s = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scum = dense.select("source", "v", "n_s", F.sum("c").over(w_s).alias("cum_s"))
    d = (
        scum.join(F.broadcast(gcum), "v")
        .crossJoin(F.broadcast(n))
        .groupBy("source", "n_s")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_s") * (F.col("n") - F.col("n_s"))
                    - (F.col("cum_all") - F.col("cum_s")) * F.col("n_s")
                )
            ).alias("d_num")
        )
    )
    ks_d = F.col("d_num").cast("double") / (F.col("n_s") * (F.col("n") - F.col("n_s")))
    n_eff = F.col("n_s").cast("double") * (F.col("n") - F.col("n_s")) / F.col("n")
    pv = d.crossJoin(F.broadcast(n)).select(
        "source",
        "n_s",
        ks_d.alias("ks_d"),
        F.least(F.lit(1.0), 2.0 * F.exp(-2.0 * ks_d * ks_d * n_eff)).alias("p"),
    )
    ranked = pv.select(
        "*",
        F.row_number().over(Window.orderBy("p", "source")).alias("rnk"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("m"),
    )
    kstar = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p") * F.col("m") <= F.col("rnk") * _BH_ALPHA, F.col("rnk")
                )
            ),
            F.lit(0),
        ).alias("k")
    )
    return ranked.crossJoin(F.broadcast(kstar)).select(
        "source",
        F.col("n_s").alias("n_docs"),
        F.round("ks_d", 5).alias("ks_d"),
        F.round("p", 6).alias("p_value"),
        F.col("rnk").cast("long").alias("p_rank"),
        F.round(F.col("rnk") * _BH_ALPHA / F.col("m"), 6).alias("bh_critical"),
        (F.col("rnk") <= F.col("k")).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# Directed association rules (confidence / leverage / conviction)
# ---------------------------------------------------------------------------

_RULE_TOPK = 25


@register(
    "association_rule_directed",
    f"""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    single AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS sup FROM items GROUP BY 1),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items),
    pairs AS (
        SELECT a.p_brand AS ante, b.p_brand AS cons,
               CAST(count(*) AS BIGINT) AS sup_ab
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand
        GROUP BY 1, 2
    ),
    rules AS (
        SELECT p.ante, p.cons, p.sup_ab, sa.sup AS sup_a, sb.sup AS sup_b,
               n.n_orders,
               CAST(p.sup_ab AS DOUBLE) / sa.sup AS conf,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(p.sup_ab AS DOUBLE) / sa.sup DESC,
                            p.sup_ab DESC, p.ante, p.cons) AS rn
        FROM pairs p
        JOIN single sa ON sa.p_brand = p.ante
        JOIN single sb ON sb.p_brand = p.cons
        CROSS JOIN n
    )
    SELECT ante, cons, sup_ab AS support,
           round(conf, 6) AS confidence,
           round(CAST(sup_ab * n_orders AS DOUBLE) / (sup_a * sup_b), 6) AS lift,
           round(CAST(sup_ab * n_orders - sup_a * sup_b AS DOUBLE)
                 / (CAST(n_orders AS DOUBLE) * n_orders), 6) AS leverage,
           CASE WHEN sup_a > sup_ab
                THEN round(CAST((n_orders - sup_b) * sup_a AS DOUBLE)
                           / (CAST(n_orders AS DOUBLE) * (sup_a - sup_ab)), 6)
           END AS conviction
    FROM rules WHERE rn <= {_RULE_TOPK}
    """,
    tags=("X-association-rules",),
)
def association_rule_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules a -> b over per-order brand baskets —
    the rule layer on top of frequent_brand_pairs' symmetric support/
    lift: confidence P(b|a) (Agrawal & Srikant 1994), leverage
    P(ab) - P(a)P(b) (Piatetsky-Shapiro 1991), and conviction
    (1 - P(b)) / (1 - conf) (Brin et al. 1997) — infinite when the rule
    never fails, emitted as NULL (the honest encoding). Top-{_RULE_TOPK}
    rules by confidence with full tiebreaks.

    Every metric is a ratio of INTEGER count products (leverage's
    numerator is sup_ab*n - sup_a*sup_b, conviction is
    ((n - sup_b) * sup_a) / (n * (sup_a - sup_ab))), so both engines
    divide the same integers — no float accumulation anywhere.
    Distributed shape: the apriori frame from frequent_brand_pairs
    (basket-keyed candidate join, never all-pairs), broadcast singles,
    one {_RULE_TOPK}-row ranking window."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = truncate_lineage(
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct(),
        eager=False,
    )
    single = items.groupBy("p_brand").agg(F.count(F.lit(1)).cast("long").alias("sup"))
    n = items.agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("ante"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("cons"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count("*").cast("long").alias("sup_ab"))
    )
    conf = F.col("sup_ab").cast("double") / F.col("sup_a")
    rules = (
        pairs.join(
            F.broadcast(single.select(F.col("p_brand").alias("ante"), F.col("sup").alias("sup_a"))),
            "ante",
        )
        .join(
            F.broadcast(single.select(F.col("p_brand").alias("cons"), F.col("sup").alias("sup_b"))),
            "cons",
        )
        .crossJoin(F.broadcast(n))
        .withColumn("conf", conf)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(
                    F.desc("conf"), F.desc("sup_ab"), F.col("ante"), F.col("cons")
                )
            ),
        )
        .filter(F.col("rn") <= _RULE_TOPK)
    )
    return rules.select(
        "ante",
        "cons",
        F.col("sup_ab").alias("support"),
        F.round("conf", 6).alias("confidence"),
        F.round(
            (F.col("sup_ab") * F.col("n_orders")).cast("double")
            / (F.col("sup_a") * F.col("sup_b")),
            6,
        ).alias("lift"),
        F.round(
            (F.col("sup_ab") * F.col("n_orders") - F.col("sup_a") * F.col("sup_b")).cast(
                "double"
            )
            / (F.col("n_orders").cast("double") * F.col("n_orders")),
            6,
        ).alias("leverage"),
        F.when(
            F.col("sup_a") > F.col("sup_ab"),
            F.round(
                ((F.col("n_orders") - F.col("sup_b")) * F.col("sup_a")).cast("double")
                / (
                    F.col("n_orders").cast("double")
                    * (F.col("sup_a") - F.col("sup_ab"))
                ),
                6,
            ),
        ).alias("conviction"),
    )


# ---------------------------------------------------------------------------
# Newman-Girvan modularity of the LPA communities on the near-dup graph
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    from .round8 import _LPA_ITERS, _LPA_STEPS
    from .training import _BANDS_CTE, _MINHASH_CTE, _PAIRS_CTE, _SHINGLES_CTE

    return f"""
    WITH RECURSIVE {_SHINGLES_CTE}, {_MINHASH_CTE}, {_BANDS_CTE}, {_PAIRS_CTE},
    sym AS (
        SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
        UNION
        SELECT doc_id_b AS src, doc_id_a AS dst FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM sym)
    {_LPA_STEPS},
    final AS (SELECT id, lbl FROM l{_LPA_ITERS}),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM sym),
    deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
    ein AS (
        SELECT la.lbl, CAST(count(*) AS BIGINT) AS e_in
        FROM sym e JOIN final la ON e.src = la.id JOIN final lb ON e.dst = lb.id
        WHERE la.lbl = lb.lbl GROUP BY 1
    ),
    dc AS (
        SELECT f.lbl, CAST(sum(d.d) AS BIGINT) AS d_c,
               CAST(count(*) AS BIGINT) AS community_size
        FROM final f JOIN deg d USING (id) GROUP BY 1
    ),
    qn AS (
        SELECT dc.lbl AS community, dc.community_size,
               COALESCE(ein.e_in, 0) AS internal_directed_edges,
               dc.d_c AS degree_sum,
               COALESCE(ein.e_in, 0) * m.m2 - dc.d_c * dc.d_c AS q_num,
               m.m2 AS m2
        FROM dc LEFT JOIN ein ON dc.lbl = ein.lbl CROSS JOIN m
    )
    SELECT community, community_size, internal_directed_edges, degree_sum,
           round(CAST(q_num AS DOUBLE) / (CAST(m2 AS DOUBLE) * m2), 6)
               AS q_contribution,
           round(CAST(sum(q_num) OVER () AS DOUBLE)
                 / (CAST(m2 AS DOUBLE) * m2), 6) AS modularity
    FROM qn
    """


@register("dedup_community_modularity", _modularity_oracle(), tags=("X-modularity",))
def dedup_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman-Girvan modularity (Newman & Girvan 2004) of the label-
    propagation communities on the LSH near-dup candidate graph:
    Q = sum_c [ e_c/m - (d_c/2m)^2 ] in its directed-count form
    (e_in/m2 - (d_c/m2)^2, m2 = 2m). This is the QUALITY metric for the
    community family the catalog already has (LPA, connected components,
    k-core, triangles): high modularity says the near-dup graph has real
    cluster structure worth per-community keeper policies; near zero
    says the pairs are scattered and doc-grain dedup suffices.

    Every per-community contribution has the INTEGER numerator
    e_in * m2 - d_c^2, so the total modularity is an integer sum divided
    once — the window sum over communities is exact integer arithmetic,
    never a float accumulation. Distributed shape: the pair frame and
    4-round LPA from dedup_label_propagation (per-round cost inventory
    in operators/dedup.label_propagation), then one edge-grain join
    against the final labels (two broadcast-size label joins), one
    degree aggregation, and community-grain arithmetic."""
    from ..operators.dedup import label_propagation, lsh_candidate_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs, k=4, rows_per_band=2)
    pairs = truncate_lineage(pairs.select("doc_id_a", "doc_id_b"), eager=False)
    labels = truncate_lineage(
        label_propagation(pairs).select(
            F.col("doc_id").alias("id"), F.col("community").alias("lbl")
        ),
        eager=False,
    )
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    sym = truncate_lineage(sym, eager=False)
    m = sym.agg(F.count("*").cast("long").alias("m2"))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("d")
    )
    la = labels.select(F.col("id").alias("src"), F.col("lbl").alias("lbl_a"))
    lb = labels.select(F.col("id").alias("dst"), F.col("lbl").alias("lbl_b"))
    ein = (
        sym.join(F.broadcast(la), "src")
        .join(F.broadcast(lb), "dst")
        .filter(F.col("lbl_a") == F.col("lbl_b"))
        .groupBy(F.col("lbl_a").alias("lbl"))
        .agg(F.count("*").cast("long").alias("e_in"))
    )
    dc = (
        labels.join(deg, "id")
        .groupBy("lbl")
        .agg(
            F.sum("d").cast("long").alias("d_c"),
            F.count("*").cast("long").alias("community_size"),
        )
    )
    qn = (
        dc.join(ein, "lbl", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.col("lbl").alias("community"),
            "community_size",
            F.coalesce("e_in", F.lit(0)).alias("internal_directed_edges"),
            F.col("d_c").alias("degree_sum"),
            (
                F.coalesce("e_in", F.lit(0)) * F.col("m2") - F.col("d_c") * F.col("d_c")
            ).alias("q_num"),
            "m2",
        )
    )
    return qn.select(
        "community",
        "community_size",
        "internal_directed_edges",
        "degree_sum",
        F.round(
            F.col("q_num").cast("double") / (F.col("m2").cast("double") * F.col("m2")),
            6,
        ).alias("q_contribution"),
        F.round(
            F.sum("q_num").over(Window.partitionBy()).cast("double")
            / (F.col("m2").cast("double") * F.col("m2")),
            6,
        ).alias("modularity"),
    )
