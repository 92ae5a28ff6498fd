"""Round-11 batch: the heaps_law_loglog_fit driver-side bisect probe
(rewritten round 12 — see below) plus the Gear CDC chunk-dedup family.

History: ``heaps_law_loglog_fit`` hashed red on the driver's DuckDB
1.2.0 for rounds 9-11 while staying exact against local DuckDB 1.0.0.
The r11 probe emitted the raw integer OLS moments of the
micro-quantized log-log points and ALSO hashed red — convicting the
per-point ``round(ln(·)·1e6)`` quantization (cross-build libm ``ln`` at
a .5e-6 boundary) and clearing the all-integer division tail. The
bisect did its job; round 12 therefore removed ``ln`` from the hashed
surface entirely (plans/round8c.py — integer doubling-grid anchors,
the hll_source_cardinality pattern). The probe lives on in its second
bisect role: it emits the component-wise integer SUMS of the anchor
table, so if the anchor family ever breaks, probe-vs-fit localizes the
divergence to a single-anchor value error (probe red too) vs an
ordering/limit/grouping surface (probe green, fit red).

No reference analog (diagnostic infrastructure, not an operator); the
upstream curve itself mirrors the vocabulary-growth family
(SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, table
from .round8c import HEAPS_CURVE_CTES, heaps_anchor_frames


@register(
    "heaps_moments_probe",
    HEAPS_CURVE_CTES
    + """
    SELECT CAST(count(*) AS BIGINT) AS n_anchors,
           CAST(sum(bucket) AS BIGINT) AS sk,
           CAST(sum(bucket * bucket) AS BIGINT) AS skk,
           CAST(sum(anchor_tokens) AS BIGINT) AS st,
           CAST(sum(anchor_vocab) AS BIGINT) AS sv,
           CAST(sum(bucket * anchor_vocab) AS BIGINT) AS skv,
           (SELECT total_tokens FROM totals) AS total_tokens,
           (SELECT total_vocab FROM totals) AS total_vocab
    FROM anchors
    """,
    tags=("X-heaps-fit",),
)
def heaps_moments_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer aggregate moments of the Heaps-curve doubling-grid
    anchors — the bisect companion to heaps_law_loglog_fit. Shares the
    exact upstream frames (heaps_anchor_frames) and oracle CTEs
    (HEAPS_CURVE_CTES): a red here plus a red fit means an anchor VALUE
    diverged; a green here with a red fit isolates a grouping/emission
    surface. Emits count, sum(bucket), sum(bucket^2),
    sum(anchor_tokens), sum(anchor_vocab) and the x·y cross-moment
    sum(bucket·anchor_vocab) — the integer inputs a consumer-side OLS
    of vocab against log2(tokens) needs.

    int64 bounds (ADVICE r11: state the overflow contract at the cast):
    ≤63 anchors by construction; bucket ≤ 62 so sk ≤ 3 906 and
    skk ≤ 242 172 always; st ≤ 63·total_tokens and
    skv ≤ 62·63·total_vocab, int64-safe for any corpus below
    ~2.4e15 distinct words — five orders of magnitude above a 100 TB
    corpus's vocabulary, and the anchor table itself is the guard (the
    sums are over 63 rows, not the corpus)."""
    anchors, totals = heaps_anchor_frames(spark, sf_dir)
    probe = anchors.agg(
        F.count("*").cast("long").alias("n_anchors"),
        F.sum("bucket").cast("long").alias("sk"),
        F.sum(F.col("bucket") * F.col("bucket")).cast("long").alias("skk"),
        F.sum("anchor_tokens").cast("long").alias("st"),
        F.sum("anchor_vocab").cast("long").alias("sv"),
        F.sum(F.col("bucket") * F.col("anchor_vocab")).cast("long").alias("skv"),
    )
    return probe.crossJoin(F.broadcast(totals)).select(
        "n_anchors", "sk", "skk", "st", "sv", "skv", "total_tokens", "total_vocab"
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (Gear CDC) dedup — the shift-resistant member
# of the chunk-dedup family
# ---------------------------------------------------------------------------

_GEAR_WINDOW = 31  # rolling window in chars (shifts >= 31 leave mod 2^31)
_GEAR_MULT = 2654435761  # Knuth multiplicative hash for the per-char gear
_GEAR_MOD = 1 << 31
_CDC_MASK = 32  # boundary when h % 32 == 0 -> expected ~32-char chunks


def _gear_lag_sum_sql() -> str:
    terms = ["gv"] + [
        f"COALESCE(lag(gv, {d}) OVER w, 0) * {1 << d}"
        for d in range(1, _GEAR_WINDOW)
    ]
    return "(" + " + ".join(terms) + f") % {_GEAR_MOD}"


def _cdc_oracle() -> str:
    return f"""
    WITH chars0 AS (
        SELECT doc_id, text,
               unnest(generate_series(1, CAST(length(text) AS BIGINT))) AS pos
        FROM documents
    ),
    chars AS (
        SELECT doc_id, pos,
               substring(text, CAST(pos AS INT), 1) AS ch,
               CAST(ascii(substring(text, CAST(pos AS INT), 1)) AS BIGINT) AS a
        FROM chars0
    ),
    gear AS (
        SELECT doc_id, pos, ch, (a * {_GEAR_MULT}) % 65536 AS gv FROM chars
    ),
    hashed AS (
        SELECT doc_id, pos, ch,
               {_gear_lag_sum_sql()} AS h
        FROM gear
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    cut AS (
        SELECT doc_id, pos, ch,
               COALESCE(sum(CASE WHEN h % {_CDC_MASK} = 0 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS chunk_no
        FROM hashed
    ),
    chunks AS (
        SELECT doc_id, chunk_no,
               CAST(count(*) AS BIGINT) AS chunk_len,
               md5(string_agg(ch, '' ORDER BY pos)) AS chunk_hash
        FROM cut GROUP BY doc_id, chunk_no
    )
    SELECT chunk_len, chunk_hash,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM chunks
    GROUP BY chunk_len, chunk_hash
    ORDER BY n_copies DESC, chunk_len DESC, chunk_hash
    LIMIT 20
    """


@register("cdc_gear_chunk_dedup", _cdc_oracle(), tags=("X-cdc-dedup",))
def cdc_gear_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (Gear CDC — Xia et al., FastCDC
    lineage): chunk every document where a rolling Gear hash of the
    last 31 characters hits ``h % 32 == 0``, then find chunks shared
    across the corpus. Unlike fixed-size chunking
    (chunk_dedup_reconstruct), CDC boundaries are functions of CONTENT,
    so inserting one character early in a document shifts at most one
    chunk — the property every storage/dataset dedup system
    (LBFS/restic/casync, and chunk-level corpus dedup) relies on.

    Integer-exact by construction — per-char gear values are a
    multiplicative hash mod 2^16, the rolling hash is an UNROLLED
    31-term lag() weighted sum mod 2^31 (weights 2^d vanish mod 2^31 at
    d >= 31, which is what bounds the window), and chunk identity is
    md5 over the reconstructed chunk content (r12, ADVICE r11: the
    original polynomial moment signature could collide across distinct
    chunks and wrap int64 on boundary-free degenerate text; a content
    hash has neither failure mode and needs no max-chunk-length guard).
    No transcendentals, no floats — the family adds nothing to the
    libm-risk surface.
    Char addressing assumes single-byte text (the corpus is ASCII at
    every SF — verified); multibyte corpora would chunk over bytes
    (cast to binary) instead, same plan.

    Distributed shape (r13, guide §4.2/§8): chunking is a pure function
    of one document's text, so the char explode + 31-lag rolling-hash
    Window + collect_list reconstruction (which hash-exchanged a
    ~5-column row PER CHARACTER of the corpus — a multi-byte-per-byte
    shuffle blowup at 100 TB) are replaced by ONE Arrow-batched map
    that emits (doc_id, chunk_len, chunk_hash) per chunk: the gear
    rolling hash is a 31-tap integer convolution (numpy int64, exact —
    max term sum 65535*(2^31-1) ~ 1.4e14), boundaries and md5s computed
    doc-locally. Only 16-byte digests ever reach an exchange (the
    cross-corpus hash group); top-20 is TakeOrderedAndProject.
    sf0.1 A/B in OPTIMIZATION_r13.md; values preflight-exact."""
    import hashlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    from ..operators.fanout import fan_out

    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    weights = None  # built lazily executor-side

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nonlocal weights
        if weights is None:
            weights = 1 << np.arange(_GEAR_WINDOW, dtype=np.int64)
        for pdf in batches:
            ids: list[int] = []
            lens: list[int] = []
            hashes: list[str] = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                if not text:
                    continue  # null/empty: generate_series(1,0) emits nothing
                n = len(text)
                # codepoints, exactly F.ascii's semantics for any input
                cp = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                gv = (cp * _GEAR_MULT) % 65536
                # h[i] = sum_{d=0..30} gv[i-d] * 2^d  (missing -> 0),
                # i.e. the unrolled lag() weighted sum, as a convolution
                h = np.convolve(gv, weights)[:n] % _GEAR_MOD
                bounds = (np.flatnonzero(h % _CDC_MASK == 0) + 1).tolist()
                if not bounds or bounds[-1] != n:
                    bounds.append(n)
                did = int(did)
                start = 0
                for b in bounds:
                    ids.append(did)
                    lens.append(b - start)
                    hashes.append(
                        hashlib.md5(text[start:b].encode("utf-8")).hexdigest()
                    )
                    start = b
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "chunk_len": pd.array(lens, dtype="int64"),
                    "chunk_hash": hashes,
                }
            )

    chunks = docs.select("doc_id", "text").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("chunk_len", T.LongType()),
                T.StructField("chunk_hash", T.StringType()),
            ]
        ),
    )
    sigs = chunks.groupBy("chunk_len", "chunk_hash").agg(
        F.count("*").cast("long").alias("n_copies"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    return sigs.orderBy(
        F.desc("n_copies"), F.desc("chunk_len"), "chunk_hash"
    ).limit(20)
