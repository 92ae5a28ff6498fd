"""Full-catalog timing sweep: warm (min-of-3 noop writes of one built
DataFrame) and first-run times for every catalog query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), optionally
cross-timed against the DuckDB oracles.

This is the harness behind the round-6 "73 -> 58 s" late batch
(BASELINE.md): run it, sort by warm time, and check every row above the
~0.3 s scheduling floor against its oracle ratio. The recurring fixable
shapes it has surfaced are catalogued in SCALE.md ("late batch") and
the project memory: multiply-consumed computed frames, CollapseProject
re-evaluation, distinct aggregates over near-unique or already-unique
keys, k single-point percentile buffers, symmetric pair double-scoring.

Caveats (same as bench.py): queries built around lazy checkpoints
(corpus prep, the LSH family, lsh_tuning_report, mutual_knn_pairs)
report warm times with their checkpoints materialized — the `first`
column is their honest rebuild cost. Interpret under load with care;
the loadavg is recorded in the payload.

Usage:
    python perf_sweep.py [--duckdb] [--json OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citibike_deep_dive_spark.session import get_spark  # noqa: E402

# Oracles that are intentionally brute-force (they exist to PROVE the
# Spark plan lossless, not to race it): quadratic all-pairs scans that
# run for many minutes at sf0.1. Never timed here — same exclusion
# bench.py applies, reason logged in BASELINE.md.
QUADRATIC_ORACLES = {
    "prefix_filter_jaccard_join",
    "lsh_tuning_report",
    # r8 ext: k x N exact-distance / unrolled-peel proof oracles
    # (55 s / 28 s at sf0.1 — they exist to prove the Spark plan
    # lossless, not to race it; BASELINE.md "extension batch")
    "coreset_kcenter_greedy",
    "dedup_kcore_peeling",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    with_duck = "--duckdb" in sys.argv
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]

    import __spark_entry__ as entry

    spark = get_spark(
        app_name="citibike-perf-sweep",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = None
    if with_duck:
        from tests.oracle_harness import duckdb_connection

        con = duckdb_connection(sf_dir)

    with open("/proc/loadavg") as fh:
        load_before = [round(float(x), 2) for x in fh.read().split()[:3]]

    results: dict[str, dict] = {}
    for name, spec in entry.CATALOG.items():
        row: dict = {}
        try:
            df = spec.build(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            row["first"] = round(time.perf_counter() - t0, 3)
            warm = row["first"]
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                warm = min(warm, time.perf_counter() - t0)
            row["warm"] = round(warm, 3)
        except Exception as exc:  # keep sweeping; report at the end
            row["error"] = str(exc)[:200]
            results[name] = row
            continue
        if con is not None and spec.oracle and name not in QUADRATIC_ORACLES:
            d_best = None
            try:
                for _ in range(3):
                    t0 = time.perf_counter()
                    con.sql(spec.oracle).fetchall()
                    d = time.perf_counter() - t0
                    d_best = d if d_best is None else min(d_best, d)
                row["duckdb"] = round(d_best, 3)
                row["ratio"] = round(row["warm"] / d_best, 2)
            except Exception as exc:
                row["duckdb_error"] = str(exc)[:120]
        results[name] = row
        print(f"# {name}: {row}", file=sys.stderr)

    with open("/proc/loadavg") as fh:
        load_after = [round(float(x), 2) for x in fh.read().split()[:3]]

    ok = {k: v for k, v in results.items() if "warm" in v}
    payload = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_errors": len(results) - len(ok),
        "total_warm": round(sum(v["warm"] for v in ok.values()), 2),
        "total_first": round(sum(v["first"] for v in ok.values()), 2),
        "loadavg_before": load_before,
        "loadavg_after": load_after,
        "queries": results,
    }
    line = json.dumps(payload)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
