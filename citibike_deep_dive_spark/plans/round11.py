"""Round-11 batch: the heaps_law_loglog_fit driver-side bisect probe.

``heaps_law_loglog_fit`` has hashed red on the driver's DuckDB 1.2.0 for
two rounds while staying exact against local DuckDB 1.0.0 (CORRECTNESS
r9/r10; VERDICT r10 "What's wrong #1"). Round 11 removes the last
floating-point surface from the fit's outputs (pure integer long
division — see round8c.py), leaving exactly ONE engine-dependent surface
upstream: the per-point ``round(ln(·)·1e6)`` quantization. This probe
emits the raw integer OLS moments so the driver's own run convicts or
clears that surface:

- probe green + fit red  → the division path diverges (impossible after
  the integer rewrite — would indicate a harness issue);
- probe red              → libm ``ln`` differs between DuckDB builds at a
  .5e-6 quantization boundary; r12 must coarsen the quantum or move the
  curve to log-spaced anchor points where ``ln`` is boundary-safe;
- both green             → the family is proven version-stable end-to-end.

No reference analog (diagnostic infrastructure, not an operator); the
upstream curve itself mirrors the vocabulary-growth family
(SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, table
from .round8c import HEAPS_CURVE_CTES, heaps_moments_frames


@register(
    "heaps_moments_probe",
    HEAPS_CURVE_CTES
    + """
    SELECT np AS n_points,
           CAST(sx AS BIGINT) AS sx,
           CAST(sy AS BIGINT) AS sy,
           CAST(sxx AS BIGINT) AS sxx,
           CAST(sxy AS BIGINT) AS sxy,
           (SELECT max(cum_tokens) FROM curve) AS total_tokens,
           (SELECT max(cum_vocab) FROM curve) AS total_vocab
    FROM moments
    """,
    tags=("X-heaps-fit",),
)
def heaps_moments_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw integer OLS moments of the Heaps-law log-log curve — the
    bisect companion to heaps_law_loglog_fit. Shares the exact upstream
    frames (heaps_moments_frames) and oracle CTEs (HEAPS_CURVE_CTES), so
    a hash mismatch here isolates the per-point ``round(ln(·)·1e6)``
    quantization as engine-dependent, while a green row proves the
    moments are bit-identical and any remaining fit divergence would sit
    in the (now all-integer) division tail. Moment magnitudes at probe
    scale (~1e17 for sxx/sxy over a 1e3-point curve) fit BIGINT; the
    decimal(38,0)/HUGEINT accumulators are downcast only at emission."""
    moments, totals = heaps_moments_frames(spark, sf_dir)
    return moments.crossJoin(F.broadcast(totals)).select(
        F.col("np").alias("n_points"),
        F.col("sx").cast("long").alias("sx"),
        F.col("sy").cast("long").alias("sy"),
        F.col("sxx").cast("long").alias("sxx"),
        F.col("sxy").cast("long").alias("sxy"),
        "total_tokens",
        "total_vocab",
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
               CAST(ascii(substring(text, CAST(pos AS INT), 1)) AS BIGINT) AS a
        FROM chars0
    ),
    gear AS (
        SELECT doc_id, pos, a, (a * {_GEAR_MULT}) % 65536 AS gv FROM chars
    ),
    hashed AS (
        SELECT doc_id, pos, a,
               {_gear_lag_sum_sql()} AS h
        FROM gear
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    cut AS (
        SELECT doc_id, pos, a,
               COALESCE(sum(CASE WHEN h % {_CDC_MASK} = 0 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS chunk_no
        FROM hashed
    ),
    inchunk AS (
        SELECT doc_id, chunk_no, a,
               row_number() OVER (PARTITION BY doc_id, chunk_no
                                  ORDER BY pos) AS rn
        FROM cut
    ),
    chunks AS (
        SELECT doc_id, chunk_no,
               CAST(count(*) AS BIGINT) AS chunk_len,
               CAST(sum(a * rn) AS BIGINT) AS sig1,
               CAST(sum(a * rn * rn) AS BIGINT) AS sig2
        FROM inchunk GROUP BY doc_id, chunk_no
    )
    SELECT chunk_len, sig1, sig2,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM chunks
    GROUP BY chunk_len, sig1, sig2
    ORDER BY n_copies DESC, chunk_len DESC, sig1, sig2
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
    d >= 31, which is what bounds the window), and chunk signatures are
    (len, sum(a*rn), sum(a*rn^2)) — no transcendentals, no floats, so
    the family adds nothing to the libm-risk surface under bisection.
    Char addressing assumes single-byte text (the corpus is ASCII at
    every SF — verified); multibyte corpora would chunk over bytes
    (cast to binary) instead, same plan.

    Distributed shape: one char explode (linear, 1 row per char); ALL
    rolling-hash lags share one Window partitioned by doc_id (a single
    exchange); the chunk_no cumulative cut and the in-chunk row_number
    reuse that same doc-clustered distribution (hash(doc_id) satisfies
    the (doc_id, chunk_no) clustering requirement — no second
    exchange); chunk signatures are a map-side-combinable groupBy; the
    cross-corpus signature group is the only other shuffle; top-20 is
    TakeOrderedAndProject. Per-doc windows are the parallel grain at
    100 TB — docs are bounded, and real deployments chunk at KB-MB
    target sizes with the identical plan."""
    docs = table(spark, sf_dir, "documents")
    chars = (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", "")).alias("pos", "c"),
        )
        # empty docs: Spark split('','') yields [''], DuckDB's
        # generate_series(1,0) yields nothing — drop the phantom char
        .filter(F.col("c") != "")
        .select("doc_id", "pos", F.ascii("c").cast("long").alias("a"))
    )
    gear = chars.withColumn("gv", (F.col("a") * F.lit(_GEAR_MULT)) % 65536)
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    h = F.col("gv")
    for d in range(1, _GEAR_WINDOW):
        h = h + F.coalesce(F.lag("gv", d).over(w_doc), F.lit(0)) * (1 << d)
    hashed = gear.withColumn("h", h % _GEAR_MOD)
    cut = hashed.withColumn(
        "chunk_no",
        F.coalesce(
            F.sum(F.when(F.col("h") % _CDC_MASK == 0, 1).otherwise(0)).over(
                w_doc.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    w_chunk = Window.partitionBy("doc_id", "chunk_no").orderBy("pos")
    inchunk = cut.withColumn("rn", F.row_number().over(w_chunk))
    chunks = inchunk.groupBy("doc_id", "chunk_no").agg(
        F.count("*").cast("long").alias("chunk_len"),
        F.sum(F.col("a") * F.col("rn")).cast("long").alias("sig1"),
        F.sum(F.col("a") * F.col("rn") * F.col("rn")).cast("long").alias("sig2"),
    )
    sigs = chunks.groupBy("chunk_len", "sig1", "sig2").agg(
        F.count("*").cast("long").alias("n_copies"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    return sigs.orderBy(
        F.desc("n_copies"), F.desc("chunk_len"), "sig1", "sig2"
    ).limit(20)
