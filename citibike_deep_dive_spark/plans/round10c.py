"""Round-10 batch 3: generation-eval metric family — chrF.

``chrf_adjacent_doc_pairs`` brings the MT/generation evaluation family
(BLEU / chrF / ROUGE) into the catalog via its most
determinism-friendly member: chrF (Popovic 2015), the character
n-gram F-score. Within each source, every document is scored against
its predecessor (by doc_id) — the self-similarity reading used as a
corpus DIVERSITY diagnostic (low adjacent chrF = diverse corpus, high
= template/boilerplate corpus; the same role self-BLEU plays in
Texygen, Zhu et al. 2018).

Why chrF and not BLEU first: with beta = 2 the per-order F-score

    F_n = 5 * P_n * R_n / (4 * P_n + R_n)  reduces to  5*o / (4*tr + th)

where o = sum_g min(hyp_count_g, ref_count_g), th/tr = total hyp/ref
char n-grams — a RATIO OF INTEGERS. The whole metric is exact integer
arithmetic up to ONE final division per order (micro-quantized on both
engines), no logs, no exps — nothing for an engine version to round
differently (the heaps_law lesson applied at the design stage).

Distributed shape (100 TB read): char-n-gram explode is scan-parallel
and linear (6x chars per doc); gram counts are map-side-combined
groupBys at (doc, n, gram) grain; the hyp-ref overlap is an equi-join
on (ref_doc, n, gram) — co-partitioned, never all-pairs; adjacent
pairing is one lag window partitioned by source. Output is
source-grain (bounded)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from .catalog import register, table

_MAX_N = 6  # chrF standard: character n-grams of order 1..6

# previously persisted gram frame, released on the next rebuild (see
# the one-slot rebuild cache note in chrf_adjacent_doc_pairs)
_LAST_GRAMS: DataFrame | None = None


def _oracle() -> str:
    nvals = ", ".join(f"({n})" for n in range(1, _MAX_N + 1))
    return f"""
    WITH d AS (
        SELECT doc_id, source,
               replace(lower(text), ' ', '') AS c
        FROM documents
    ),
    pairs AS (
        SELECT doc_id AS hyp_id,
               lag(doc_id) OVER w AS ref_id,
               source,
               length(c) AS len_h,
               lag(length(c)) OVER w AS len_r
        FROM d
        WINDOW w AS (PARTITION BY source ORDER BY doc_id)
    ),
    p2 AS (SELECT * FROM pairs WHERE ref_id IS NOT NULL),
    grams AS (
        SELECT doc_id, n, substr(c, i, n) AS g,
               CAST(count(*) AS BIGINT) AS cnt
        FROM d
        CROSS JOIN (VALUES {nvals}) nn(n),
        unnest(generate_series(1, length(c) - n + 1)) pos(i)
        WHERE length(c) >= n
        GROUP BY doc_id, n, substr(c, i, n)
    ),
    overlap AS (
        SELECT p.hyp_id, h.n,
               CAST(sum(least(h.cnt, r.cnt)) AS BIGINT) AS o
        FROM p2 p
        JOIN grams h ON h.doc_id = p.hyp_id
        JOIN grams r ON r.doc_id = p.ref_id AND r.n = h.n AND r.g = h.g
        GROUP BY p.hyp_id, h.n
    ),
    per_order AS (
        -- gram TOTALS are just length - n + 1 (every position is one
        -- gram), so no second pass over the gram frame is needed
        SELECT l.source, l.hyp_id, nn.n,
               CASE WHEN (4 * greatest(l.len_r - nn.n + 1, 0)
                          + greatest(l.len_h - nn.n + 1, 0)) > 0
                    THEN CAST(round(5.0 * COALESCE(o.o, 0) * 1000000
                                    / (4 * greatest(l.len_r - nn.n + 1, 0)
                                       + greatest(l.len_h - nn.n + 1, 0)))
                              AS BIGINT)
                    ELSE 0 END AS f_micro
        FROM p2 l
        CROSS JOIN (VALUES {nvals}) nn(n)
        LEFT JOIN overlap o ON o.hyp_id = l.hyp_id AND o.n = nn.n
    ),
    per_pair AS (
        SELECT source, hyp_id,
               CAST(sum(f_micro) // {_MAX_N} AS BIGINT) AS chrf_micro
        FROM per_order
        GROUP BY source, hyp_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(chrf_micro) // count(*) AS BIGINT) AS mean_chrf_micro,
           min(chrf_micro) AS min_chrf_micro,
           max(chrf_micro) AS max_chrf_micro
    FROM per_pair
    GROUP BY source
    """


@register("chrf_adjacent_doc_pairs", _oracle(), tags=("X-chrf-eval",))
def chrf_adjacent_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF2 (Popovic 2015) between each document and its predecessor
    within the same source — the generation-eval metric family's
    integer-exact member, read here as a corpus-diversity diagnostic
    (self-BLEU's role in Zhu et al. 2018). Per char-n-gram order
    n = 1..6: F_n = 5*o/(4*tr + th) with o = clipped overlap count,
    th/tr = hyp/ref gram totals — one micro-quantized integer division
    per order, integer floor-mean across orders and across pairs: no
    transcendental anywhere, version-proof by construction.

    Scale shape: linear 6x-per-char gram explode (scan-parallel),
    map-side-combined (doc, n, gram) counts, equi-join overlap on
    (ref_doc, n, gram) — co-partitioned, never all-pairs; the adjacent
    pairing is one lag window partitioned by source; output at bounded
    source grain."""
    from ..operators.fanout import fan_out

    # fan_out: the 6x-per-char gram explode is the dominant cost and
    # must not inherit a single-file scan's one-task parallelism
    # (no-op on well-split inputs — the 100 TB case)
    docs = fan_out(table(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        F.replace(F.lower("text"), F.lit(" "), F.lit("")).alias("c"),
    )
    w_src = Window.partitionBy("source").orderBy("doc_id")
    # gram totals are length - n + 1, so the pair row carries both docs'
    # char lengths and the totals never touch the gram frame
    pairs = (
        docs.select(
            F.col("doc_id").alias("hyp_id"),
            F.lag("doc_id").over(w_src).alias("ref_id"),
            "source",
            F.length("c").alias("len_h"),
            F.lag(F.length("c")).over(w_src).alias("len_r"),
        )
        .filter(F.col("ref_id").isNotNull())
    )
    # gram counts at (doc, n, gram) grain; the sequence fan-out is
    # guarded for docs shorter than n (sequence(1, 0) would step -1 —
    # the ADVICE r9 boilerplate lesson)
    orders = F.explode(
        F.sequence(F.lit(1), F.lit(_MAX_N))
    ).alias("n")
    # DISK_ONLY persist, not a checkpoint: the gram-count frame is
    # GRAM-grain (6x distinct n-grams per doc — the query's largest
    # intermediate) and BOTH overlap-join sides read it. A
    # localCheckpoint pins non-evictable blocks in the unified pool and
    # starved the aggregate at 10x (AGGREGATE_OUT_OF_MEMORY, seen at
    # sf1); plain recompute paid the explode twice (once per join
    # side). DISK_ONLY materializes once, costs no execution memory,
    # and both join branches reuse the same relation.
    from pyspark import StorageLevel

    # One-slot rebuild cache: the CacheManager holds persisted plans
    # until an explicit unpersist, so repeated builds in a long-lived
    # driver (sweeps, benches) would otherwise accumulate DISK_ONLY
    # blocks. Each rebuild releases the previous round's frame (by
    # then fully consumed — sweeps materialize each build before the
    # next); a session restart makes the stale handle raise, which is
    # safely ignored.
    global _LAST_GRAMS
    if _LAST_GRAMS is not None:
        try:
            _LAST_GRAMS.unpersist()
        except Exception:
            pass  # stale handle from a stopped session
        _LAST_GRAMS = None

    grams = (
        docs.select("doc_id", "c", orders)
        .select(
            "doc_id",
            "n",
            F.explode(
                F.when(
                    F.length("c") >= F.col("n"),
                    F.expr("transform(sequence(1, length(c) - n + 1), "
                           "i -> substring(c, i, n))"),
                ).otherwise(F.array())
            ).alias("g"),
        )
        .groupBy("doc_id", "n", "g")
        .agg(F.count("*").cast("long").alias("cnt"))
        .persist(StorageLevel.DISK_ONLY)
    )
    _LAST_GRAMS = grams
    # The gram-count frame is GRAM-grain (6x distinct n-grams per doc —
    # the big side of every join here) and, being checkpoint-truncated,
    # carries no size stats: without an explicit hint AQE's default
    # estimate marks it broadcastable and the broadcast build OOMs at
    # 10x; shuffle_hash OOMs too (its per-task hash relation cannot
    # spill under 32 concurrent tasks). SORT-MERGE is the only
    # spill-safe strategy for this big-big join — both keys are
    # high-cardinality and co-partitionable, and at 100 TB this join
    # would never fit a hash build anyway.
    h = grams.select(
        F.col("doc_id").alias("hyp_id"),
        "n",
        "g",
        F.col("cnt").alias("hc"),
    ).hint("merge")
    r = grams.select(
        F.col("doc_id").alias("ref_id"),
        "n",
        "g",
        F.col("cnt").alias("rc"),
    ).hint("merge")
    overlap = (
        pairs.join(h, "hyp_id")
        .join(r, ["ref_id", "n", "g"])
        .groupBy("hyp_id", "n")
        .agg(F.sum(F.least("hc", "rc")).alias("o"))
    )
    th = F.greatest(F.col("len_h") - F.col("n") + 1, F.lit(0))
    tr = F.greatest(F.col("len_r") - F.col("n") + 1, F.lit(0))
    per_order = (
        pairs.select(
            "*", F.explode(F.sequence(F.lit(1), F.lit(_MAX_N))).alias("n")
        )
        .join(overlap, ["hyp_id", "n"], "left")
        .select(
            "source",
            "hyp_id",
            "n",
            F.when(
                (4 * tr + th) > 0,
                F.round(
                    F.lit(5.0)
                    * F.coalesce("o", F.lit(0))
                    * 1000000
                    / (4 * tr + th),
                    0,
                ).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("f_micro"),
        )
    )
    per_pair = (
        per_order.groupBy("source", "hyp_id")
        .agg(F.sum("f_micro").alias("fsum"))
        .select(
            "source",
            "hyp_id",
            F.expr(f"fsum div {_MAX_N}").alias("chrf_micro"),
        )
    )
    return per_pair.groupBy("source").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.expr("sum(chrf_micro) div count(*)")
        .cast("long")
        .alias("mean_chrf_micro"),
        F.min("chrf_micro").alias("min_chrf_micro"),
        F.max("chrf_micro").alias("max_chrf_micro"),
    )
