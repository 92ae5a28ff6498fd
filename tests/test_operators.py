from __future__ import annotations

from pyspark.sql import functions as F

from citibike_deep_dive_spark.normalize import normalize_trips
from citibike_deep_dive_spark.operators.dockmap import (
    dock_aggregate,
    dock_export_json,
    dock_merge,
    dock_monthly,
)
from citibike_deep_dive_spark.operators.heatmap import heatmap_update
from citibike_deep_dive_spark.operators.linegraph import linegraph_aggregate
from citibike_deep_dive_spark.operators.tripsmap import (
    densify,
    enrich_routes,
    top_trips,
    trip_aggregate,
    tripsmap_update,
)
from citibike_deep_dive_spark.operators.upsert import additive_upsert, anti_insert

from tests.trips_fixture import modern_era_pdf


def clean_trips(spark):
    return normalize_trips(spark.createDataFrame(modern_era_pdf()), file_year="2023")


def test_linegraph_aggregate(spark):
    out = linegraph_aggregate(clean_trips(spark)).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.year, row.month) == ("2023", "Jul")
    assert row.subscriber_count == 2  # r1, r3
    assert row.customer_count == 2  # r2, r4 (self-loop still counts here)


def test_heatmap_update_merges_additively(spark):
    trips = clean_trips(spark)
    first = heatmap_update(None, trips)
    # replaying the same file through the merge doubles every count
    merged = heatmap_update(first, trips)
    counts = {(r.year, r.month, r.hour): r.total_count for r in merged.collect()}
    assert counts[("2023", "Jul", 8)] == 2  # r1 twice
    assert counts[("2023", "Jul", 17)] == 2  # r2 twice
    assert sum(counts.values()) == 8


def test_additive_upsert_union_semantics(spark):
    main = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "cnt"])
    delta = spark.createDataFrame([("b", 10), ("c", 5)], ["k", "cnt"])
    out = {r.k: r.cnt for r in additive_upsert(main, delta, ["k"], ["cnt"]).collect()}
    assert out == {"a": 1, "b": 12, "c": 5}


def test_anti_insert(spark):
    main = spark.createDataFrame([("a",)], ["k"])
    cand = spark.createDataFrame([("a",), ("b",)], ["k"])
    out = [r.k for r in anti_insert(main, cand, ["k"]).collect()]
    assert out == ["b"]


def test_trip_aggregate_and_topk(spark):
    agg = trip_aggregate(clean_trips(spark))
    rows = {(r.start_station_name, r.end_station_name): r for r in agg.collect()}
    # self-loop r4 excluded; A->B counted twice with MIN(start_time)
    assert ("Alpha", "Alpha") not in rows
    ab = rows[("Alpha", "Beta")]
    assert ab.trip_count == 2
    assert ab.trip_time.isoformat() == "2023-07-01T08:00:00"

    top = top_trips(agg, k=1).collect()
    assert len(top) == 1
    assert top[0].start_station_name == "Alpha"


def test_route_enrichment_offline(spark):
    top = top_trips(trip_aggregate(clean_trips(spark)), k=2)
    enriched = enrich_routes(top).collect()
    for row in enriched:
        wps = row.waypoints
        assert len(wps) >= 2
        # waypoints are [lon, lat] pairs, 5-dp rounded, hourly timestamps
        assert wps[0].coordinates[0] == round(row.start_station_longitude, 5)
        assert wps[0].coordinates[1] == round(row.start_station_latitude, 5)
        assert wps[1].timestamp == (wps[0].timestamp + 3600) % 86400


def test_route_enrichment_native_equals_pandas(spark):
    """The r5 native-column default path must stay byte-identical (via
    to_json) to the mapInPandas + straight_line_geometry path it
    replaced, on both the fixture trips (mixed densify bands) and the
    synthesized route-query data (all >0.37 km → 4-point branch)."""
    from citibike_deep_dive_spark.operators.tripsmap import (
        enrich_routes_native,
        straight_line_geometry,
    )
    from citibike_deep_dive_spark.plans.advanced import _synth_dock_trips
    from citibike_deep_dive_spark.plans.catalog import table

    def canon(df):
        out = df.select(
            "year", "start_station_name", "end_station_name",
            F.to_json("waypoints").alias("wp"),
        )
        return sorted(map(tuple, out.collect()))

    tops = [top_trips(trip_aggregate(clean_trips(spark)), k=5)]
    synth = _synth_dock_trips(
        table(spark, "/root/testdata/sf0.001", "orders")
    ).withColumn(
        "start_time", F.lit("2024-03-05 07:31:02.5").cast("timestamp")
    ).withColumn("rideable_type", F.lit("classic_bike"))
    tops.append(top_trips(trip_aggregate(synth), k=5))

    for top in tops:
        native = canon(enrich_routes_native(top))
        pandas_path = canon(enrich_routes(top, straight_line_geometry))
        assert native == pandas_path
        assert native  # non-empty
    """extend_shape parity (update_tripsmap.py:176-203): distances are
    computed with the reference's transposed lat/lon call, linspace
    INCLUDES endpoints, and the loop-exit append duplicates the last point
    of a densified final segment."""
    # 0.006° of real longitude = 0.006° of transposed latitude ≈ 0.67 km
    # > 0.37 → linspace(0,1,4) (endpoints + 2 interior) + duplicate end
    far = densify([[-73.99, 40.75], [-73.996, 40.75]])
    assert len(far) == 5
    assert far[0] == [-73.99, 40.75]
    assert far[2] == [round(-73.99 + (-0.006) * (2 / 3), 5), 40.75]
    assert far[3] == far[4] == [-73.996, 40.75]
    # 0.0025° real longitude ≈ 0.28 km: strict middle band → linspace(0,1,2)
    # = just the two endpoints (no interior!) + duplicate end
    mid = densify([[-73.99, 40.75], [-73.9925, 40.75]])
    assert mid == [[-73.99, 40.75], [-73.9925, 40.75], [-73.9925, 40.75]]
    # tiny hop → segment start kept + final append, no duplication
    assert densify([[-73.99, 40.75], [-73.9901, 40.7501]]) == [
        [-73.99, 40.75],
        [-73.9901, 40.7501],
    ]
    # real-LATITUDE spans are shrunk by cos(~74°) under the transposed
    # call: 0.005° of latitude reads as ~0.15 km → NOT densified (the old
    # correct-distance code would have split this 0.56 km hop)
    assert len(densify([[-73.99, 40.75], [-73.99, 40.755]])) == 2


def test_tripsmap_update(spark):
    agg = trip_aggregate(clean_trips(spark))
    merged = tripsmap_update(agg, agg)
    ab = [r for r in merged.collect() if r.start_station_name == "Alpha"][0]
    assert ab.trip_count == 4


def test_dock_pipeline_and_merge(spark):
    trips = clean_trips(spark)
    monthly = dock_monthly(trips)
    m = {r.station_name: r for r in monthly.collect()}
    # Alpha: starts r1,r3,r4 ; ends r4 -> total 4
    assert m["Alpha"].month_starts == 3
    assert m["Alpha"].month_ends == 1
    assert m["Alpha"].month_total == 4
    # Beta: starts r2 ; ends r1,r3
    assert m["Beta"].month_starts == 1
    assert m["Beta"].month_ends == 2

    dock = dock_aggregate(trips)
    d = {r.station_name: r for r in dock.collect()}
    alpha = d["Alpha"].station_data
    assert alpha["2023"].year_starts == 3
    assert alpha["2023"].months["Jul"].month_total == 4

    # replay-merge: new year data REPLACES year_starts (X2 semantics)
    merged = dock_merge(dock, dock)
    d2 = {r.station_name: r for r in merged.collect()}
    assert d2["Alpha"].station_data["2023"].year_starts == 3

    json_out = dock_export_json(merged).collect()[0]
    assert isinstance(json_out.station_data, str)
    assert '"year_starts":' in json_out.station_data


def test_dock_merge_month_union_new_wins(spark):
    from pyspark.sql import types as T

    data_type = T.MapType(
        T.StringType(),
        T.StructType(
            [
                T.StructField("year_starts", T.LongType()),
                T.StructField("year_ends", T.LongType()),
                T.StructField(
                    "months",
                    T.MapType(
                        T.StringType(),
                        T.StructType(
                            [
                                T.StructField("month_total", T.LongType()),
                                T.StructField("month_starts", T.LongType()),
                                T.StructField("month_ends", T.LongType()),
                            ]
                        ),
                    ),
                ),
            ]
        ),
    )
    schema = T.StructType(
        [
            T.StructField("station_name", T.StringType()),
            T.StructField("station_id", T.StringType()),
            T.StructField("station_latitude", T.DoubleType()),
            T.StructField("station_longitude", T.DoubleType()),
            T.StructField("station_data", data_type),
        ]
    )
    old = spark.createDataFrame(
        [("S", "id", 1.0, 2.0, {"2023": (10, 10, {"Jan": (5, 3, 2), "Feb": (5, 3, 2)})})],
        schema,
    )
    new = spark.createDataFrame(
        [("S", "id", 1.0, 2.0, {"2023": (7, 7, {"Feb": (9, 9, 0), "Mar": (1, 1, 0)})})],
        schema,
    )
    merged = dock_merge(old, new).collect()[0].station_data["2023"]
    assert merged.year_starts == 7  # replaced, not added
    months = merged.months
    assert months["Jan"].month_total == 5  # kept from old
    assert months["Feb"].month_total == 9  # new wins
    assert months["Mar"].month_total == 1  # added


def test_dock_merge_tagged_equals_two_pipeline(spark):
    """The fused side-tagged dock pipeline (one scan) must stay
    result-identical to the two-pipeline + full-outer-join form the
    catalog carrier uses — the fused shape is the 100 TB scan-bound
    alternative (see plans/advanced.py and SCALE.md) and must not rot."""
    from citibike_deep_dive_spark.operators.dockmap import (
        dock_aggregate,
        dock_merge,
        dock_merge_tagged,
        dock_monthly,
        dock_yearly,
    )
    from citibike_deep_dive_spark.plans.advanced import (
        _synth_dock_trips,
        canonical_station_data,
    )
    from citibike_deep_dive_spark.plans.catalog import table

    trips = _synth_dock_trips(table(spark, "/root/testdata/sf0.001", "orders"))
    exist_pred = F.col("o_orderkey") % 3 != 0
    delta_pred = (F.col("o_orderkey") % 3 == 0) & (F.col("year") >= "1999")

    two_pipe = dock_merge(
        dock_aggregate(trips.filter(exist_pred)),
        dock_aggregate(trips.filter(delta_pred)),
    )
    tagged_in = trips.withColumn(
        "side", F.when(exist_pred, "e").when(delta_pred, "d")
    ).filter(F.col("side").isNotNull())
    fused = dock_merge_tagged(
        dock_yearly(dock_monthly(tagged_in, ("side",)), ("side",))
    )

    def canon(df):
        out = df.select(
            "station_name", "station_id", "station_latitude",
            "station_longitude",
            F.to_json(canonical_station_data(F.col("station_data"))).alias("sd"),
        )
        return sorted(map(tuple, out.collect()))

    assert canon(two_pipe) == canon(fused)

    # r5: the flat-merge JSON form (what the catalog carrier now runs —
    # merge at relational grain, serialize via string fragments) must be
    # BYTE-identical to to_json(canonical(...)) of the MapType merge.
    from citibike_deep_dive_spark.operators.dockmap import dock_merge_fused_json

    flat = dock_merge_fused_json(trips, exist_pred, delta_pred)
    assert sorted(map(tuple, flat.collect())) == canon(two_pipe)
