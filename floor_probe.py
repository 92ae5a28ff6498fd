"""Floor-vs-growth probe (VERDICT r11 item 5): for a warm catalog query,
decompose wall-clock into executor TASK time vs scheduling/driver
overhead using the Spark UI REST API. A query whose summed task time is
well under wall x cores — and whose wall is dominated by non-task time —
is SCHEDULING-FLOOR bound at local[32]: its >2x-vs-DuckDB ratio is a
local-mode constant, not a growth term, and disappears into a cluster's
per-stage overheads at real scale.

Usage: python floor_probe.py <query> [<sf_dir>]   (default sf_dir: the
derived sf1 at /tmp/sparkgraft_sf1; run bench_sf1.py --regen first).
Prints one JSON line: wall, task_time_sum, n_tasks, n_stages,
task_time_over_wall (parallelism actually achieved), and
floor_fraction = 1 - task_time/(wall * cores) — the share of the
machine the query never used.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citibike_deep_dive_spark.plans import CATALOG  # noqa: E402
from citibike_deep_dive_spark.session import get_spark  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_sf1"
    spark = get_spark(
        app_name="citibike-floor-probe",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # the library session disables the UI; the probe needs the
            # REST status API it serves
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    df = CATALOG[name].build(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm-up / checkpoint build

    before = {s["stageId"] for s in _api(base, f"applications/{app_id}/stages")}
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    stages = [
        s
        for s in _api(base, f"applications/{app_id}/stages?status=complete")
        if s["stageId"] not in before
    ]
    task_ms = sum(s.get("executorRunTime", 0) for s in stages)
    cpu_ms = sum(s.get("executorCpuTime", 0) for s in stages) / 1e6  # ns -> ms
    n_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
    out = {
        "query": name,
        "sf_dir": sf_dir,
        "cores": cores,
        "wall_s": round(wall, 3),
        "n_stages": len(stages),
        "n_tasks": n_tasks,
        "task_time_s": round(task_ms / 1000, 3),
        "cpu_time_s": round(cpu_ms / 1000, 3),
        # effective parallelism: how many cores' worth of task time ran
        "task_time_over_wall": round(task_ms / 1000 / wall, 2) if wall else None,
        # share of the machine's capacity the warm run never used
        "floor_fraction": round(1 - task_ms / 1000 / (wall * cores), 3)
        if wall
        else None,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
