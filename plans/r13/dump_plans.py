"""Dump .explain("formatted") for the headline queries to
plans/r13/<query>_{before,after}.txt (stage picked by argv[1]).

Usage: python plans/r13/dump_plans.py before [name ...]
       python plans/r13/dump_plans.py after  [name ...]

Default name set: the bench HEADLINE list. Plans are compiled at
$SPARK_GRAFT_SF_DIR (default sf0.1 — the bench's scale) so the judge can
check plan-shape claims (Exchange count, join strategy, PushedFilters,
Python boundaries) against the committed files.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
sys.path.insert(0, _REPO)

from bench import HEADLINE  # noqa: E402
from citibike_deep_dive_spark.plans import CATALOG  # noqa: E402
from citibike_deep_dive_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    spark = get_spark(app_name=f"plan-dump-{stage}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = CATALOG[name].build(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — record the failure text
            plan = f"ERROR {type(exc).__name__}: {exc}\n"
        out = os.path.join(_HERE, f"{name}_{stage}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars -> {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
