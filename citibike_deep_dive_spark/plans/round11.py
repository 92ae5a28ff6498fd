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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register
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
