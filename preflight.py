"""Strict driver pre-flight: run the verify queue's front at sf0.01 and
compare Spark vs DuckDB with EXACT value equality (no float rounding).

The driver's correctness gate hashes canonicalized values, so a 1e-9
float divergence that tests/oracle_harness.py (6-dp tolerant) forgives
still burns the round's hash row (r3: embedding_dim_covariance). Run
this before shipping changes that reorder the verify queue:

    python preflight.py [name ...]      # default: verify_order()[:50]
    python preflight.py --all           # every catalog query
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from citibike_deep_dive_spark.plans import CATALOG  # noqa: E402
from citibike_deep_dive_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import duckdb_connection  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def _exact(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v  # exact — no rounding
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_exact(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _exact(x)) for k, x in v.items()))
    return v


def check(name: str, spark, con) -> str:
    spec = CATALOG[name]
    df = spec.build(spark, SF_DIR)
    spark_rows = [r.asDict() for r in df.collect()]
    if spec.oracle is None:
        return f"ROWS-ONLY rows={len(spark_rows)}"
    rel = con.sql(spec.oracle)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    if sorted(df.columns) != sorted(duck_cols):
        return f"SCHEMA spark={sorted(df.columns)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return f"ROWCOUNT spark={len(spark_rows)} duck={len(duck_rows)}"
    order = sorted(df.columns)
    d_idx = [duck_cols.index(c) for c in order]
    # Sort by the full repr so distinct tuples that stringify to the same
    # sort key still land in a canonical order — a str(value)-keyed stable
    # sort kept each engine's input order for such ties, making an equal
    # multiset compare unequal (spurious fail-safe HASH-DIFF).
    s_set = sorted(
        (tuple(_exact(r[c]) for c in order) for r in spark_rows), key=repr
    )
    d_set = sorted(
        (tuple(_exact(r[i]) for i in d_idx) for r in duck_rows), key=repr
    )
    if s_set == d_set:
        return f"OK rows={len(spark_rows)}"
    # find the worst float divergence for diagnosis
    worst = 0.0
    ndiff = 0
    example = None
    for s, d in zip(sorted(map(str, s_set)), sorted(map(str, d_set))):
        if s != d:
            ndiff += 1
            if example is None:
                example = (s[:160], d[:160])
    for s, d in zip(s_set, d_set):
        for a, b in zip(s, d):
            if isinstance(a, float) and isinstance(b, float):
                worst = max(worst, abs(a - b))
    return (
        f"HASH-DIFF rows={len(spark_rows)} diff_rows~{ndiff} "
        f"max_float_delta={worst:.3e}\n    spark={example[0] if example else ''}\n"
        f"    duck ={example[1] if example else ''}"
    )


def main() -> None:
    if sys.argv[1:] == ["--all"]:
        names = list(CATALOG)
    else:
        names = sys.argv[1:] or entry.verify_order()[:50]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(SF_DIR)
    bad = 0
    for name in names:
        try:
            msg = check(name, spark, con)
        except Exception as e:  # noqa: BLE001 — report and keep going
            msg = f"ERROR {type(e).__name__}: {str(e)[:200]}"
        flag = "" if msg.startswith(("OK", "ROWS-ONLY")) else " <<<"
        if flag:
            bad += 1
        print(f"{name}: {msg}{flag}", flush=True)
    print(f"\n{bad} problem(s) across {len(names)} queries")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
