"""Single source of truth for the Gopher-style quality gate.

The gate (Rae et al. 2021 §A1.1 heuristics, thresholds tuned to the
synthetic corpus) is consumed by four plans: ``gopher_quality_rules``
(curation.py — the canonical carrier), ``fairness_gate_parity`` /
``ucb_source_allocation`` (round8s.py — audits OF the gate) and
``cramers_v_matrix`` (round8w.py — uses keep/drop as a facet). Before
this module each copy restated the thresholds verbatim; a future
threshold change would have silently desynced the audits from the gate
they audit (round-8 ADVICE finding). Both the Spark column expression
and the DuckDB oracle fragment are built here from one constant set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Thresholds: word-count bounds, mean-word-length window, duplicate-word
# fraction cap. Tuned so both branches occur on the synthetic corpus
# (words 10-99, median 56).
GOPHER_MIN_WORDS = 25
GOPHER_MAX_WORDS = 90
GOPHER_MIN_MEAN_WORD_LEN = 4.2
GOPHER_MAX_MEAN_WORD_LEN = 5.2
GOPHER_MAX_FRAC_DUP_WORDS = 0.6


def gopher_metrics(text_col: str = "text") -> dict[str, Column]:
    """The gate's three per-document metrics as Spark columns over a raw
    text column: word count ``nw``, mean word length ``mwl``, duplicate
    -word fraction ``fdup``. Array HOFs only — one narrow projection,
    no explode, no shuffle, stays inside whole-stage codegen."""
    w = F.split(F.lower(text_col), " ")
    nw = F.size(w)
    mwl = F.expr(
        f"aggregate(split(lower({text_col}), ' '), 0L, (a, x) -> a + length(x))"
    ).cast("double") / nw
    fdup = F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / nw
    return {"nw": nw, "mwl": mwl, "fdup": fdup}


def gopher_keep_expr(text_col: str = "text") -> Column:
    """The keep flag (int 0/1) as a Spark column."""
    m = gopher_metrics(text_col)
    return (
        m["nw"].between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & m["mwl"].between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (m["fdup"] < GOPHER_MAX_FRAC_DUP_WORDS)
    ).cast("int")


def gopher_keep_bool_sql(w: str = "w") -> str:
    """The keep predicate as a DuckDB boolean fragment over a list-of-words
    column (``string_split(lower(text), ' ')``)."""
    return (
        f"(len({w}) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}"
        f" AND CAST(list_aggregate(list_transform({w}, x -> len(x)),"
        f" 'sum') AS DOUBLE) / len({w})"
        f" BETWEEN {GOPHER_MIN_MEAN_WORD_LEN} AND {GOPHER_MAX_MEAN_WORD_LEN}"
        f" AND 1.0 - CAST(len(list_distinct({w})) AS DOUBLE) / len({w})"
        f" < {GOPHER_MAX_FRAC_DUP_WORDS})"
    )
