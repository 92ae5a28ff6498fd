"""End-to-end pipeline + CLI + DuckDB export (the reference's main loop,
main.py:23-83, and export artifact, export_data.py:24-31)."""

from __future__ import annotations

import os
import zipfile

import duckdb
import pytest

from citibike_deep_dive_spark.pipeline import run_pipeline, read_table
from citibike_deep_dive_spark.sources.export import (
    export_warehouse_to_duckdb,
    parse_bucket_listing_xml,
)

from tests.trips_fixture import legacy_era_pdf, modern_era_pdf


@pytest.fixture()
def inbox(tmp_path):
    d = tmp_path / "inbox"
    d.mkdir()
    with zipfile.ZipFile(d / "202307-citibike-tripdata.csv.zip", "w") as z:
        z.writestr("202307-citibike-tripdata.csv", modern_era_pdf().to_csv(index=False))
        z.writestr("__MACOSX/._junk.csv", "garbage")
    with zipfile.ZipFile(d / "2019-citibike-tripdata.zip", "w") as z:
        z.writestr("2019-citibike-tripdata.csv", legacy_era_pdf().to_csv(index=False))
    return str(d)


def test_pipeline_end_to_end_idempotent(spark, inbox, tmp_path):
    wh = str(tmp_path / "warehouse")
    r1 = run_pipeline(spark, inbox, wh, top_k=5)
    assert len(r1.processed) == 2 and r1.skipped == 0

    tables = {}
    for t in ("linegraph", "heatmap", "dock", "trips"):
        df = read_table(spark, wh, t)
        assert df is not None and df.count() > 0, t
        tables[t] = sorted(repr(r) for r in df.collect())

    # idempotence: second run is a no-op and changes nothing
    r2 = run_pipeline(spark, inbox, wh, top_k=5)
    assert len(r2.processed) == 0 and r2.skipped == 2
    for t, before in tables.items():
        assert sorted(repr(r) for r in read_table(spark, wh, t).collect()) == before


def test_duckdb_export_artifact(spark, inbox, tmp_path):
    wh = str(tmp_path / "warehouse")
    run_pipeline(spark, inbox, wh, top_k=5)
    db = str(tmp_path / "CitibikeData.db")
    exported = export_warehouse_to_duckdb(wh, db)
    assert set(exported) == {"linegraph", "heatmap", "dock", "trips"}
    con = duckdb.connect(db, read_only=True)
    try:
        for t in exported:
            n = con.execute(f'SELECT count(*) FROM "{t}"').fetchone()[0]
            want = spark.read.parquet(os.path.join(wh, t)).count()
            assert n == want, t
        # the nested station_data survives the format hop
        row = con.execute(
            "SELECT station_name, station_data FROM dock LIMIT 1"
        ).fetchone()
        assert row[0] and row[1]
    finally:
        con.close()


def test_cli_main(inbox, tmp_path):
    from citibike_deep_dive_spark.__main__ import main

    wh = str(tmp_path / "wh_cli")
    db = str(tmp_path / "out.db")
    rc = main(
        [
            "--input-dir", inbox,
            "--warehouse", wh,
            "--export-db", db,
            "--top-k", "3",
            "--cpus", "8",
        ]
    )
    assert rc == 0
    assert os.path.exists(db)
    assert duckdb.connect(db, read_only=True).execute(
        "SELECT count(*) FROM linegraph"
    ).fetchone()[0] > 0


def test_parse_bucket_listing_xml():
    xml = (
        '<?xml version="1.0"?>'
        '<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">'
        "<Contents><Key>202301-citibike-tripdata.csv.zip</Key></Contents>"
        "<Contents><Key>JC-202301-citibike-tripdata.csv.zip</Key></Contents>"
        "<Contents><Key>index.html</Key></Contents>"
        "</ListBucketResult>"
    )
    assert parse_bucket_listing_xml(xml) == [
        "202301-citibike-tripdata.csv.zip",
        "JC-202301-citibike-tripdata.csv.zip",
        "index.html",
    ]
