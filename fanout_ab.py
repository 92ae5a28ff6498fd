"""One-shot catalog-wide fan_out A/B at sf0.1: for every catalog query,
time warm (min-of-3 noop writes) with fan_out as-committed vs fan_out
patched to identity in every module that bound it. Interleaved per
query (WITH then WITHOUT back-to-back) so environment drift hits both
arms equally. Emits JSON with per-query deltas, sorted by saving.

Context: the round-8 extension batch measured fan_out as a pure loss on
aggregation-first queries over the 5k-row single-file documents scan
(BASELINE.md "Round-8 extension batch"); this sweep finds every other
catalog row with the same shape. fan_out is a no-op at the 100 TB
design point (well-split inputs), so removals are perf-neutral at scale
by construction.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from citibike_deep_dive_spark.session import get_spark  # noqa: E402
import citibike_deep_dive_spark.operators.fanout as fanout_mod  # noqa: E402

MODULES = [
    "citibike_deep_dive_spark.operators.corpus",
    "citibike_deep_dive_spark.operators.dedup",
    "citibike_deep_dive_spark.operators.similarity",
    "citibike_deep_dive_spark.operators.textstats",
    "citibike_deep_dive_spark.plans.advanced",
    "citibike_deep_dive_spark.plans.curation",
    "citibike_deep_dive_spark.plans.mining",
    "citibike_deep_dive_spark.plans.round6",
    "citibike_deep_dive_spark.plans.round8",
    "citibike_deep_dive_spark.plans.scalepath",
    "citibike_deep_dive_spark.plans.training",
]

SF = "/root/testdata/sf0.1"


def main() -> None:
    import importlib

    import __spark_entry__ as entry

    mods = [importlib.import_module(m) for m in MODULES]
    real = fanout_mod.fan_out
    identity = lambda df, target=None, barrier=False: df  # noqa: E731

    def set_fanout(fn):
        fanout_mod.fan_out = fn
        for m in mods:
            if hasattr(m, "fan_out"):
                m.fan_out = fn

    spark = get_spark(
        app_name="fanout-ab",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def warm(df):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    results = {}
    for name, spec in entry.CATALOG.items():
        try:
            set_fanout(real)
            with_df = spec.build(spark, SF)
            t_with = warm(with_df)
            set_fanout(identity)
            wo_df = spec.build(spark, SF)
            t_wo = warm(wo_df)
        except Exception as exc:
            results[name] = {"error": str(exc)[:160]}
            continue
        finally:
            set_fanout(real)
        results[name] = {
            "with": round(t_with, 3),
            "without": round(t_wo, 3),
            "saving": round(t_with - t_wo, 3),
        }
        print(f"# {name}: with={t_with:.3f} without={t_wo:.3f}", file=sys.stderr)

    ok = {k: v for k, v in results.items() if "saving" in v}
    ranked = sorted(ok.items(), key=lambda kv: -kv[1]["saving"])
    payload = {
        "n": len(results),
        "total_with": round(sum(v["with"] for v in ok.values()), 2),
        "total_without": round(sum(v["without"] for v in ok.values()), 2),
        "top_savings": ranked[:40],
        "regressions": [kv for kv in ranked if kv[1]["saving"] < -0.04][-20:],
    }
    with open("/tmp/fanout_ab.json", "w") as fh:
        json.dump({"summary": payload, "all": results}, fh, indent=1)
    print(json.dumps(payload["top_savings"][:20], indent=1))
    print("totals:", payload["total_with"], "->", payload["total_without"])


if __name__ == "__main__":
    main()
