"""Every catalog query must ANALYZE under a hostile session: non-UTC
timezone, vanilla confs — the conditions the driver (and any production
cluster) may impose. Analysis-only (no execution), so the whole catalog
checks in seconds; this is the guard that would have caught the r02
TIMESTAMP_NTZ breakage before the driver did."""

from __future__ import annotations

from citibike_deep_dive_spark.plans import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def test_all_queries_analyze_under_hostile_timezone(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    failures = []
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        for name, spec in CATALOG.items():
            try:
                spec.build(spark, SF_DIR).schema  # forces full analysis
            except Exception as exc:  # noqa: BLE001 — collect all, then report
                failures.append(f"{name}: {str(exc).splitlines()[0][:120]}")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert not failures, "analysis failed under non-UTC session:\n" + "\n".join(failures)
