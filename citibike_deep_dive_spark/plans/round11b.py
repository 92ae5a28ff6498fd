"""Round-11 batch 2: four integer/string-exact families — triangle
counting, exact repeated-substring spans, HyperLogLog registers, and
phonetic (Soundex) blocking.

All four are deliberately transcendental-free (the round-11 rule:
no new libm-quantized surfaces until the heaps_moments_probe verdict
lands — SCALE.md §Round-11):

- ``graph_triangle_count`` completes the graph-analytics surface (CC,
  label-prop, PageRank, modularity, k-core, rich-club, assortativity,
  Adamic-Adar) with the classic distributed-graph benchmark op:
  per-node triangle participation and local clustering coefficient on
  the mutual-kNN embedding graph.
- ``repeated_substring_spans`` is the EXACT-substring dedup family
  (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
  Better"): per-document spans covered by 16-char grams that occur
  more than once in the corpus, merged into maximal islands — the
  character-exact complement to shingle/minhash (token-approximate)
  and CDC (chunk-grain) dedup.
- ``hll_source_cardinality`` is the canonical mergeable cardinality
  sketch (Flajolet et al. 2007): m=64 leading-zero registers per
  source over the portable 60-bit hash, raw estimate computed by pure
  integer long division against the exact distinct count side by side
  — the scale path for COUNT(DISTINCT) where exact is unaffordable,
  next to the KMV sketch (kmv_sketch_set_ops) it complements.
- ``soundex_token_blocks`` is record-linkage BLOCKING: phonetic codes
  as the partition key that turns all-pairs edit-distance dedup
  (fuzzy_dedup_levenshtein) into bounded within-block work — the text
  analog of LSH banding, in pure deterministic string algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from ..functions.portable import portable_hash64, portable_hash64_sql
from .catalog import register, table

# ---------------------------------------------------------------------------
# Triangle counting + local clustering on the mutual-kNN graph
# ---------------------------------------------------------------------------


def _tri_oracle() -> str:
    from .training import _cos_sql

    cos = _cos_sql("a.embedding", "b.embedding")
    return f"""
    WITH scored AS (
        SELECT a.label, a.vec_id AS src, b.vec_id AS dst, {cos} AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    knn AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY src
                                         ORDER BY cos_sim DESC, dst) AS rn
            FROM scored
        ) WHERE rn <= 5
    ),
    pairs AS (
        SELECT f.src AS a, f.dst AS b
        FROM knn f JOIN knn r ON f.src = r.dst AND f.dst = r.src
        WHERE f.src < f.dst
    ),
    sym AS (SELECT a AS s, b AS d FROM pairs UNION ALL SELECT b, a FROM pairs),
    deg AS (SELECT s AS id, CAST(count(*) AS BIGINT) AS dg FROM sym GROUP BY 1),
    tri AS (
        SELECT p1.a AS x, p1.b AS y, p2.b AS z
        FROM pairs p1
        JOIN pairs p2 ON p1.b = p2.a
        JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b
    ),
    tn AS (
        SELECT x AS id FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    ),
    pernode AS (SELECT id, CAST(count(*) AS BIGINT) AS t FROM tn GROUP BY 1),
    outp AS (
        SELECT d.id AS node_id, d.dg AS degree,
               COALESCE(p.t, 0) AS n_triangles,
               CASE WHEN d.dg >= 2 THEN
                    (2 * (2000000 * COALESCE(p.t, 0)) + d.dg * (d.dg - 1))
                    // (2 * d.dg * (d.dg - 1))
                    ELSE 0 END AS clustering_micro
        FROM deg d LEFT JOIN pernode p ON d.id = p.id
    )
    SELECT node_id, degree, n_triangles,
           CAST(clustering_micro AS BIGINT) AS clustering_micro
    FROM outp
    ORDER BY n_triangles DESC, node_id
    LIMIT 20
    """


@register("graph_triangle_count", _tri_oracle(), tags=("X-triangles",))
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient
    C(v) = 2T(v) / (d(v)(d(v)-1)) on the mutual-kNN embedding graph —
    the classic distributed-graph benchmark operator and the dedup
    reading of transitivity: triangles are near-dup clusters already
    closed under mutual similarity (a high-clustering node sits inside
    a clique-like duplicate group; a high-degree low-clustering node is
    a hub LSH banding would over-bucket).

    Enumeration is the canonical ordered form: canonical a<b edges
    joined as a<b<c paths (p1.b = p2.a) closed by the (p1.a, p2.b)
    edge — each triangle counted exactly once, no orientation pass.
    The clustering ratio is pure integer long division (the r11 rule),
    zero floats anywhere downstream of the kNN build. Scale shape: the
    cell-restricted mutual-kNN edge build (shared, driver-proven since
    r8); the path join shuffles on vertex id — at production scale the
    standard hedge is degree-ordering the orientation so hub fan-out is
    bounded by sqrt(edges) (documented, not needed at the 2k-bounded
    mutual-kNN degrees where max fan-out is 10); triangle rows then
    explode 3x into a map-side-combined per-node count. cf. reference
    has no graph surface; extension family (SURVEY §2 extensions)."""
    from .round6 import mutual_knn_pairs

    pairs = truncate_lineage(
        mutual_knn_pairs(spark, sf_dir).select(
            F.col("id_a").alias("a"), F.col("id_b").alias("b")
        ),
        eager=False,
    )  # read by sym-degrees and three self-join aliases
    sym = pairs.select(F.col("a").alias("id")).unionAll(
        pairs.select(F.col("b").alias("id"))
    )
    deg = sym.groupBy("id").agg(F.count("*").cast("long").alias("dg"))
    p1 = pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
    p2 = pairs.select(F.col("a").alias("y"), F.col("b").alias("z"))
    p3 = pairs.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = p1.join(p2, "y").join(p3, ["x", "z"])
    tn = (
        tri.select(F.col("x").alias("id"))
        .unionAll(tri.select(F.col("y").alias("id")))
        .unionAll(tri.select(F.col("z").alias("id")))
    )
    pernode = tn.groupBy("id").agg(F.count("*").cast("long").alias("t"))
    out = (
        deg.join(pernode, "id", "left")
        .withColumn("t", F.coalesce("t", F.lit(0)))
        .select(
            F.col("id").alias("node_id"),
            F.col("dg").alias("degree"),
            F.col("t").alias("n_triangles"),
            F.expr(
                "CAST(CASE WHEN dg >= 2 THEN"
                " (2 * (2000000 * t) + dg * (dg - 1))"
                " div (2 * dg * (dg - 1))"
                " ELSE 0 END AS BIGINT)"
            ).alias("clustering_micro"),
        )
    )
    return out.orderBy(F.desc("n_triangles"), "node_id").limit(20)


# ---------------------------------------------------------------------------
# Exact repeated-substring spans (Lee et al. 2021 substring dedup)
# ---------------------------------------------------------------------------

_SPAN_L = 16  # gram width in chars; spans are unions of repeated grams


def _spans_oracle() -> str:
    gh = portable_hash64_sql(f"substring(text, CAST(pos AS INT), {_SPAN_L})")
    return f"""
    WITH grams AS (
        SELECT doc_id,
               unnest(generate_series(1, length(text) - {_SPAN_L - 1})) AS pos,
               text
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, pos, {gh} AS gh
        FROM grams
    ),
    rep AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos, count(*) OVER (PARTITION BY gh) AS c
            FROM keyed
        ) WHERE c > 1
    ),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN lag(pos) OVER w IS NULL
                         OR pos > lag(pos) OVER w + {_SPAN_L}
                    THEN 1 ELSE 0 END AS new_island
        FROM rep
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    islanded AS (
        SELECT doc_id, pos,
               sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged
    ),
    spans AS (
        SELECT doc_id, island,
               max(pos) + {_SPAN_L - 1} - min(pos) + 1 AS span_len
        FROM islanded GROUP BY doc_id, island
    ),
    perdoc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(span_len) AS BIGINT) AS covered_chars
        FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
           p.n_spans, p.covered_chars,
           CAST((2 * 1000000 * p.covered_chars + length(d.text))
                // (2 * length(d.text)) AS BIGINT) AS coverage_micro
    FROM perdoc p JOIN documents d ON p.doc_id = d.doc_id
    ORDER BY coverage_micro DESC, d.doc_id
    LIMIT 20
    """


@register("repeated_substring_spans", _spans_oracle(), tags=("X-substring-dedup",))
def repeated_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring coverage (Lee et al. 2021's ExactSubstr
    dedup, anchor form): every 16-char gram occurring more than once in
    the corpus marks its positions; per document, marked positions
    within gram-width of each other merge into maximal contiguous
    ISLANDS (their 16-char windows union into one span), and documents
    rank by the fraction of their characters covered by repeated spans
    — the character-exact dedup signal that catches verbatim
    boilerplate shingle/minhash dilutes and CDC only sees at chunk
    grain. The production suffix-array method finds the same spans;
    the gram-anchor form is its distributed approximation with
    one-sided error only at span EDGES (< gram width), never missing a
    repeat >= 16 chars.

    Integer-exact throughout: positions, island ids (a lag/cumsum
    window pair), span unions (contiguity is guaranteed because
    consecutive marked positions <= 16 apart have overlapping or
    touching windows), and a long-division coverage ratio. Scale
    shape: gram hashing is DOC-LOCAL — one Arrow map (over a fanned-out
    scan; fan_out is a no-op on well-split inputs) emits (doc_id, pos,
    60-bit gram hash), so only 8-byte keys ever shuffle, never 16-char
    strings (a false repeat needs a 60-bit collision, ~n^2/2^61, and a
    second hash window doubles the bits if a 100 TB corpus needs it).
    The r13 form replaced a Catalyst transform()/substring explode
    (interpreted per element, ~us/gram in expression eval) plus a
    vestigial checkpoint of the gram frame — the frame is consumed
    exactly ONCE by the count window, so checkpointing it was a pure
    write+read of rows-per-char at scale. The Python md5 window
    reproduces portable_hash64 bit-exactly:
    int(md5(utf8).hexdigest()[:15], 16) == conv(substring(md5(g),1,15),
    16, 10) (same digest, same hex window, same base-16 parse). Island
    windows partition by doc_id; the final ranking is
    TakeOrderedAndProject. At 100 TB the gram count frame prunes to
    count>1 before the join — the overwhelmingly common unique grams
    never shuffle twice."""
    import hashlib
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..functions.md5vec import md5_hash60_block16, windows16_words
    from ..operators.fanout import fan_out

    docs = table(spark, sf_dir, "documents")

    def grams(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # r14 (guide §4.2): the per-gram ``hashlib.md5`` call chain
        # (slice -> md5() -> hexdigest -> int(,16), ~0.85 us/gram) was
        # the dominant map cost at sf1 (~14M grams). All grams are
        # 16-byte single-block messages, so the MD5 runs as ONE
        # vectorized numpy pass over every gram of the whole Arrow
        # batch (per-doc kernel launches would pay the 64-round loop's
        # ~500 elementwise-op overhead per DOC — a net loss for short
        # docs) — bit-identical by construction (tests pin it vs
        # hashlib) — and the id/pos columns build as numpy ranges
        # instead of Python list extends.
        md5 = hashlib.md5
        empty = np.empty(0, dtype=np.int64)
        for pdf in batches:
            id_parts: list[np.ndarray] = []
            pos_parts: list[np.ndarray] = []
            gh_parts: list = []  # None = ASCII doc, filled after the kernel
            word_parts: list[np.ndarray] = []  # (m, 4) uint32 per ASCII doc
            sizes: list[int] = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                if not text:
                    continue  # null/empty: the when() guard emits nothing
                m = len(text) - _SPAN_L + 1
                if m <= 0:
                    continue  # shorter than one gram: otherwise(array())
                enc = text.encode("utf-8")
                if len(enc) == len(text):  # ASCII: byte slice == char slice
                    word_parts.append(windows16_words(enc))
                    sizes.append(m)
                    gh_parts.append(None)  # deferred to the batch kernel
                else:  # non-ASCII: slice code points, encode per gram
                    gh_parts.append(
                        np.fromiter(
                            (
                                int(
                                    md5(
                                        text[i : i + _SPAN_L].encode("utf-8")
                                    ).hexdigest()[:15],
                                    16,
                                )
                                for i in range(m)
                            ),
                            dtype=np.int64,
                            count=m,
                        )
                    )
                id_parts.append(np.full(m, int(did), dtype=np.int64))
                pos_parts.append(np.arange(1, m + 1, dtype=np.int64))
            if word_parts:  # one 64-round pass over ALL grams of the batch
                all_gh = md5_hash60_block16(np.concatenate(word_parts))
                bounds = np.cumsum(sizes)[:-1]
                ascii_gh = iter(np.split(all_gh, bounds))
                gh_parts = [
                    next(ascii_gh) if g is None else g for g in gh_parts
                ]
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(id_parts) if id_parts else empty,
                    "pos": np.concatenate(pos_parts) if pos_parts else empty,
                    "gh": np.concatenate(gh_parts) if gh_parts else empty,
                }
            )

    keyed = fan_out(docs.select("doc_id", "text")).mapInPandas(
        grams,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("pos", T.LongType()),
                T.StructField("gh", T.LongType()),
            ]
        ),
    )
    # repeated positions via ONE count-over-window on the hash key —
    # the groupBy+join-back form shuffled the gram frame twice (once to
    # count, once to join); the window moves it once (sf1 A/B below)
    rep = (
        keyed.withColumn(
            "c", F.count("*").over(Window.partitionBy("gh"))
        )
        .filter(F.col("c") > 1)
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = rep.withColumn(
        "new_island",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + _SPAN_L),
            1,
        ).otherwise(0),
    )
    islanded = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = islanded.groupBy("doc_id", "island").agg(
        (F.max("pos") + _SPAN_L - 1 - F.min("pos") + 1).alias("span_len")
    )
    perdoc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum("span_len").cast("long").alias("covered_chars"),
    )
    out = perdoc.join(
        docs.select("doc_id", F.length("text").cast("long").alias("n_chars")),
        "doc_id",
    ).select(
        "doc_id",
        "n_chars",
        "n_spans",
        "covered_chars",
        F.expr(
            "CAST((2 * 1000000 * covered_chars + n_chars)"
            " div (2 * n_chars) AS BIGINT)"
        ).alias("coverage_micro"),
    )
    return out.orderBy(F.desc("coverage_micro"), "doc_id").limit(20)


# ---------------------------------------------------------------------------
# HyperLogLog registers per source (raw estimate vs exact, side by side)
# ---------------------------------------------------------------------------

_HLL_M = 64  # registers (p = 6); raw std error 1.04/sqrt(64) ~ 13%
_HLL_RMAX = 55  # rank when the 54 remaining hash bits are all zero
_POW2_RMAX = 1 << _HLL_RMAX
# alpha_64 * m^2 * 2^55, alpha in micro units (0.709390 for m=64):
# 709390 * 64 * 64 * 2^55 — exact integer, embedded as a decimal literal
_HLL_NUM = 709390 * _HLL_M * _HLL_M * _POW2_RMAX


def _hll_oracle() -> str:
    h = portable_hash64_sql("tok")
    return f"""
    WITH toks AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    dist AS (SELECT DISTINCT source, tok FROM toks),
    hashed AS (
        SELECT source, {h} AS h FROM dist
    ),
    ranked AS (
        SELECT source, h % {_HLL_M} AS bucket,
               CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_RMAX}
                    ELSE {_HLL_RMAX} - length(bin(h // {_HLL_M})) END AS rho
        FROM hashed
    ),
    regs AS (
        SELECT source, bucket, max(rho) AS m_j
        FROM ranked GROUP BY source, bucket
    ),
    sums AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_present,
               CAST(sum(1::BIGINT << ({_HLL_RMAX} - m_j)) AS BIGINT) AS s_present
        FROM regs GROUP BY source
    ),
    exact AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_distinct_exact
        FROM dist GROUP BY source
    ),
    sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
        FROM toks GROUP BY source
    )
    SELECT e.source, z.n_tokens, e.n_distinct_exact,
           CAST({_HLL_M} - s.n_present AS BIGINT) AS n_zero_registers,
           CAST((2 * {_HLL_NUM}::HUGEINT
                 + 1000000::HUGEINT * (s.s_present
                     + ({_HLL_M} - s.n_present) * {_POW2_RMAX}::HUGEINT))
                // (2 * 1000000::HUGEINT * (s.s_present
                     + ({_HLL_M} - s.n_present) * {_POW2_RMAX}::HUGEINT))
                AS BIGINT) AS hll_estimate
    FROM exact e JOIN sums s ON e.source = s.source
    JOIN sizes z ON e.source = z.source
    ORDER BY e.source
    """


@register("hll_source_cardinality", _hll_oracle(), tags=("X-hll",))
def hll_source_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog cardinality registers per source (Flajolet et al.
    2007), reported NEXT TO the exact distinct count so the estimate is
    auditable: bucket = low 6 bits of the portable 60-bit hash, rank =
    leading-zero position of the remaining 54 bits (computed as
    55 - bitlength via bin(), an exact string op both engines share),
    registers = per-bucket max rank — the mergeable sketch that replaces
    COUNT(DISTINCT) at 100 TB (registers combine with element-wise max
    across shards/streams; the shuffle carries at most m=64 rows per
    source, not the token stream). The raw estimate
    alpha_m * m^2 / sum(2^-M_j) is computed by PURE INTEGER long
    division: sum(2^-M_j) = S / 2^55 with S an exact BIGINT (empty
    buckets contribute 2^55 each), and the alpha*m^2*2^55 numerator is
    a precomputed integer constant in micro units — no transcendental,
    no float (the r11 rule). The documented estimator bias below
    2.5*m is visible in the emitted n_zero_registers; the linear-
    counting correction needs ln() and is deliberately left to the
    consumer. Complements the KMV sketch (kmv_sketch_set_ops): KMV
    gives set-operation cardinalities, HLL gives the cheapest mergeable
    single-set counter. Scale shape: token explode -> (source, bucket)
    groupBy, map-side combined (64 buckets x sources); everything after
    is metadata-scale. The exact side exists for audit at test SF and
    would be dropped at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    toks = truncate_lineage(
        docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        ),
        eager=False,
    )  # read by the distinct set and the multiset size
    # ONE string shuffle: registers and the exact count both derive
    # from the distinct (source, tok) set — max-of-rank over a multiset
    # equals max over its support, so hashing only distinct tokens is
    # value-identical and the sf1 A/B showed the duplicate-token md5 +
    # second string shuffle dominating the original two-pass form.
    dist = truncate_lineage(
        toks.distinct(), eager=False
    )  # read by regs and the exact audit count
    hashed = dist.select("source", portable_hash64(F.col("tok")).alias("h"))
    rem = F.expr(f"h div {_HLL_M}")
    ranked = hashed.select(
        "source",
        (F.col("h") % _HLL_M).alias("bucket"),
        F.when(rem == 0, F.lit(_HLL_RMAX))
        .otherwise(F.lit(_HLL_RMAX) - F.length(F.bin(rem)))
        .alias("rho"),
    )
    regs = ranked.groupBy("source", "bucket").agg(F.max("rho").alias("m_j"))
    sums = regs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_present"),
        F.sum(F.expr(f"CAST(1 AS BIGINT) << ({_HLL_RMAX} - m_j)"))
        .cast("long")
        .alias("s_present"),
    )
    exact = dist.groupBy("source").agg(
        F.count("*").cast("long").alias("n_distinct_exact")
    ).join(
        toks.groupBy("source").agg(F.count("*").cast("long").alias("n_tokens")),
        "source",
    )
    s_full = (
        F.col("s_present").cast("decimal(38,0)")
        + (F.lit(_HLL_M) - F.col("n_present")) * F.lit(_POW2_RMAX).cast("decimal(38,0)")
    )
    return (
        exact.join(sums, "source")
        .withColumn("s_full", s_full)
        .select(
            "source",
            "n_tokens",
            "n_distinct_exact",
            (F.lit(_HLL_M) - F.col("n_present")).cast("long").alias(
                "n_zero_registers"
            ),
            F.expr(
                f"CAST((2 * CAST('{_HLL_NUM}' AS DECIMAL(38,0))"
                f" + 1000000 * s_full) div (2 * 1000000 * s_full) AS BIGINT)"
            ).alias("hll_estimate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Phonetic blocking (Soundex) — the blocking-key primitive for fuzzy dedup
# ---------------------------------------------------------------------------

_SOUNDEX_FROM = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_SOUNDEX_TO = "01230120022455012623010202"  # simplified: H,W coded 0 like vowels


def _soundex_sql(expr: str) -> str:
    s = f"translate(upper({expr}), '{_SOUNDEX_FROM}', '{_SOUNDEX_TO}')"
    # collapse runs per digit — RE2 (DuckDB) has no backreferences, so
    # the (.)\1+ form is unavailable; seven fixed patterns are portable
    for d in "0123456":
        s = f"regexp_replace({s}, '{d}+', '{d}', 'g')"
    return (
        f"upper(substring({expr}, 1, 1)) || "
        f"substring(replace(substring({s}, 2), '0', '') || '000', 1, 3)"
    )


def _soundex_spark(col):
    s = F.translate(F.upper(col), _SOUNDEX_FROM, _SOUNDEX_TO)
    for d in "0123456":
        s = F.regexp_replace(s, f"{d}+", d)
    return F.concat(
        F.upper(F.substring(col, 1, 1)),
        F.substring(
            # two-arg substr takes the FULL tail — identical to the
            # oracle's two-arg substring (ADVICE r11: the old
            # substring(s, 2, 1000) bound was the only cross-engine
            # divergence surface in an otherwise exact pair)
            F.concat(F.regexp_replace(F.substr(s, F.lit(2)), "0", ""), F.lit("000")),
            1,
            3,
        ),
    )


@register(
    "soundex_token_blocks",
    f"""
    WITH toks AS (
        SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    alpha AS (SELECT tok FROM toks WHERE regexp_matches(tok, '^[a-z]+$')),
    coded AS (SELECT tok, {_soundex_sql('tok')} AS code FROM alpha),
    blocks AS (
        SELECT code,
               CAST(count(*) AS BIGINT) AS n_tokens,
               min(tok) AS sample_token,
               CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS pairs_bound
        FROM coded GROUP BY code
    )
    SELECT code, n_tokens, sample_token, pairs_bound
    FROM blocks
    ORDER BY n_tokens DESC, code
    LIMIT 20
    """,
    tags=("X-phonetic-blocking",),
)
def soundex_token_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking for fuzzy entity/vocabulary dedup: Soundex
    codes (simplified American variant — H/W coded as vowels, the
    documented difference from the archival rule) over the distinct
    alphabetic vocabulary, reporting the 20 largest blocks with their
    within-block pair bound n(n-1)/2. Blocking is the primitive that
    makes edit-distance dedup scale: fuzzy_dedup_levenshtein compares
    all candidate pairs, and a phonetic block key turns that O(n^2)
    into sum-over-blocks(b^2) — same-sounding typo variants land in
    one block, so the expensive comparison only runs where a match is
    plausible (classic record-linkage blocking; the text analog of LSH
    banding for edit distance).

    Deterministic string algebra on both engines: translate() to digit
    codes, run-collapse via seven fixed per-digit regexp_replace passes
    (RE2 has no backreferences, so the (.)\\1+ form is deliberately
    avoided), vowel-drop, pad to 4. Zero floats, zero transcendentals.
    Scale shape: one token explode -> distinct (the Heaps-bounded
    vocabulary), per-row string codegen for the code, one
    map-side-combined groupBy on the code, TakeOrderedAndProject."""
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok").rlike("^[a-z]+$"))
        .distinct()
    )
    coded = toks.select("tok", _soundex_spark(F.col("tok")).alias("code"))
    blocks = coded.groupBy("code").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.min("tok").alias("sample_token"),
        (F.count("*") * (F.count("*") - 1) / 2).cast("long").alias("pairs_bound"),
    )
    return blocks.orderBy(F.desc("n_tokens"), "code").limit(20)
