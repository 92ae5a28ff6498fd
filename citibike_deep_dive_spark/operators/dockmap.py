"""DockTable maintenance — the reference's hardest pipeline, fully native.

Reference pipeline (citibike_data_process/table_updating/update_dockmap.py):
- starts/ends per (station, year, month) with ANY_VALUE attrs (A3/A4, :54-81)
- FULL OUTER join + COALESCE station union (J1, :82-96)
- month → year rollup (A5, :110-129)
- json_group_object month map + json_group_array year collect (A6/A7,
  :119-126, :148-159)
- driver-side Python year-map merge + deep merge with the existing table
  (X1/X2, :146-196, :214-251) and correlated-subquery UPDATE (J6, :260-284)

Spark re-expression: station_data is a *native* column
``MapType(year -> struct(year_starts, year_ends, months: MapType(month ->
struct(month_total, month_starts, month_ends))))``. The reference's
fetchall → dict.update → executemany loops (X1/X2) become
``map_from_entries`` + ``map_zip_with`` — zero driver round-trips, zero
Python in the executor hot path. JSON text exists only at export
(``to_json``), matching SURVEY.md §1.2's guidance.

Determinism: ANY_VALUE becomes max() so DuckDB-oracle hashes are stable
(SURVEY.md §4).

Scale notes: the whole pipeline is two shuffles — one hash aggregation to
(station, year, month) grain (map-side combined), one re-agg to station
grain. The deep merge joins on station_name only; the delta (one month of
stations, ~2k rows) is broadcast so the existing 100 TB-scale table never
reshuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dock_monthly(trips: DataFrame, extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """A4 + J1: starts ⟗ ends per (station, year, month), attrs coalesced
    starts-first (update_dockmap.py:54-96). ``extra_keys`` prepends extra
    grouping columns (e.g. a side tag) so several logical pipelines share
    ONE physical scan+shuffle — see dock_deep_merge_nested_maps.

    Fused single-scan form: instead of two side aggregations full-outer
    joined back together (two scans of the trips + a shuffle join), unpivot
    each trip into its start/end station rows and aggregate once. The
    conditional aggregates reproduce the join+coalesce semantics exactly —
    ``max(when(is_start...))`` is the starts-side attr (null when the
    station-month has no starts, falling through to the ends side, which
    is what COALESCE over the full-outer join did), and the side-filtered
    counts are 0-defaulted just like ``coalesce(month_starts, 0)``.
    Output is column- and type-identical to the joined form; year/month
    are non-null by construction upstream (derived from started_at after
    the P6 gate), which is the one case where groupBy (null-safe) and a
    USING join (null-dropping) would differ.

    Scale: one scan, one map-side-combined shuffle — at 100 TB this
    halves the input volume and removes the (station, year, month)
    shuffle join entirely.
    """

    def _side(side: str, is_start: int):
        return F.struct(
            F.lit(is_start).alias("is_start"),
            F.col(f"{side}_station_name").alias("station_name"),
            F.col(f"{side}_station_id").alias("station_id"),
            F.col(f"{side}_station_latitude").alias("station_latitude"),
            F.col(f"{side}_station_longitude").alias("station_longitude"),
        )

    sides = trips.select(
        *extra_keys,
        "year",
        "month",
        F.explode(F.array(_side("start", 1), _side("end", 0))).alias("s"),
    ).filter(F.col("s.station_name").isNotNull())

    start = F.col("s.is_start") == 1

    def _attr(name: str):
        return F.coalesce(
            F.max(F.when(start, F.col(f"s.{name}"))),
            F.max(F.when(~start, F.col(f"s.{name}"))),
        ).alias(name)

    agg = sides.groupBy(
        *extra_keys, F.col("s.station_name").alias("station_name"), "year", "month"
    ).agg(
        _attr("station_id"),
        _attr("station_latitude"),
        _attr("station_longitude"),
        F.sum("s.is_start").cast("long").alias("month_starts"),
        F.count("*").alias("month_total"),
    )
    return agg.select(
        *extra_keys,
        "station_name",
        "year",
        "month",
        "station_id",
        "station_latitude",
        "station_longitude",
        "month_starts",
        (F.col("month_total") - F.col("month_starts")).alias("month_ends"),
        "month_total",
    )


def dock_yearly(monthly: DataFrame, extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """A5 + A6: month → year rollup; the months map replaces DuckDB's
    json_group_object (update_dockmap.py:110-129)."""
    return monthly.groupBy(*extra_keys, "station_name", "year").agg(
        F.max("station_id").alias("station_id"),
        F.max("station_latitude").alias("station_latitude"),
        F.max("station_longitude").alias("station_longitude"),
        F.sum("month_starts").alias("year_starts"),
        F.sum("month_ends").alias("year_ends"),
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("month").alias("key"),
                        F.struct(
                            "month_total", "month_starts", "month_ends"
                        ).alias("value"),
                    )
                )
            )
        ).alias("months"),
    )


def dock_station(yearly: DataFrame, extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """A7 + X1: collect each station's year-objects into one map — the
    reference's json_group_array + Python dict.update loop
    (update_dockmap.py:146-196), as map_from_entries over sorted entries."""
    # sort_array can't order structs containing maps (the months sub-map),
    # so sort with an explicit key comparator instead.
    entries = F.collect_list(
        F.struct(
            F.col("year").alias("key"),
            F.struct("year_starts", "year_ends", "months").alias("value"),
        )
    )
    by_key = F.array_sort(
        entries,
        lambda a, b: F.when(a.key < b.key, -1).when(a.key > b.key, 1).otherwise(0),
    )
    return yearly.groupBy(*extra_keys, "station_name").agg(
        F.max("station_id").alias("station_id"),
        F.max("station_latitude").alias("station_latitude"),
        F.max("station_longitude").alias("station_longitude"),
        F.map_from_entries(by_key).alias("station_data"),
    )


def dock_aggregate(trips: DataFrame, extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """Full new-data pipeline: trips → per-station nested station_data."""
    return dock_station(
        dock_yearly(dock_monthly(trips, extra_keys), extra_keys), extra_keys
    )


def _merged_station_data(e_data, d_data):
    """X2 deep-merge expression over two station_data maps: year attrs
    replace (new wins), months union with new-wins, one-sided stations
    pass through (update_dockmap.py:214-251)."""
    merged = F.map_zip_with(
        e_data,
        d_data,
        lambda _y, old, new: F.when(new.isNull(), old).otherwise(
            F.struct(
                new.year_starts.alias("year_starts"),
                new.year_ends.alias("year_ends"),
                F.when(old.isNull(), new.months)
                .otherwise(
                    F.map_zip_with(
                        old.months, new.months, lambda _m, mo, mn: F.coalesce(mn, mo)
                    )
                )
                .alias("months"),
            )
        ),
    )
    return (
        F.when(e_data.isNull(), d_data)
        .when(d_data.isNull(), e_data)
        .otherwise(merged)
    )


def dock_merge(existing: DataFrame | None, delta: DataFrame) -> DataFrame:
    """X2 deep merge (update_dockmap.py:214-251) + J3 anti-insert + J6
    update, as ONE full-outer join:

    - year level: new year's year_starts/year_ends *replace* existing,
    - month level: months union with new-wins (:229-234),
    - attrs: new wins when present,
    - stations only in one side pass through.
    """
    if existing is None:
        return delta
    joined = existing.alias("e").join(
        F.broadcast(delta).alias("d"), "station_name", "full_outer"
    )
    return joined.select(
        "station_name",
        F.coalesce(F.col("d.station_id"), F.col("e.station_id")).alias("station_id"),
        F.coalesce(F.col("d.station_latitude"), F.col("e.station_latitude")).alias(
            "station_latitude"
        ),
        F.coalesce(F.col("d.station_longitude"), F.col("e.station_longitude")).alias(
            "station_longitude"
        ),
        _merged_station_data(
            F.col("e.station_data"), F.col("d.station_data")
        ).alias("station_data"),
    )


def dock_merge_tagged(
    yearly: DataFrame,
    side_col: str = "side",
    existing_tag: str = "e",
    delta_tag: str = "d",
) -> DataFrame:
    """dock_station + dock_merge in ONE aggregation, for the fused
    single-scan form where existing and delta are one ``side``-tagged
    pipeline (see dock_deep_merge_nested_maps).

    ``yearly`` is dock_yearly output with the side tag still in the key.
    Grouping by station alone and building each side's station_data from
    side-filtered collect_lists replaces {second station-grain shuffle per
    side + full-outer join} with a single station-grain shuffle — and
    join-free merge means no join-key skew to manage at 100 TB.
    Semantics identical to ``dock_merge(dock_station(e), dock_station(d))``:
    collect_list drops the other side's NULLed entries, an absent side
    yields an empty entry array which maps back to NULL so the pass-through
    branches fire, and attrs keep new-wins-then-existing precedence.
    """
    e = F.col(side_col) == existing_tag
    d = F.col(side_col) == delta_tag

    def _side_data(cond):
        entries = _sort_entries_by_key(
            F.collect_list(
                F.when(
                    cond,
                    F.struct(
                        F.col("year").alias("key"),
                        F.struct("year_starts", "year_ends", "months").alias("value"),
                    ),
                )
            )
        )
        return F.when(F.size(entries) > 0, F.map_from_entries(entries))

    def _side_attr(name, cond):
        return F.max(F.when(cond, F.col(name)))

    agg = yearly.groupBy("station_name").agg(
        _side_attr("station_id", e).alias("e_station_id"),
        _side_attr("station_latitude", e).alias("e_station_latitude"),
        _side_attr("station_longitude", e).alias("e_station_longitude"),
        _side_attr("station_id", d).alias("d_station_id"),
        _side_attr("station_latitude", d).alias("d_station_latitude"),
        _side_attr("station_longitude", d).alias("d_station_longitude"),
        _side_data(e).alias("e_data"),
        _side_data(d).alias("d_data"),
    )
    return agg.select(
        "station_name",
        F.coalesce("d_station_id", "e_station_id").alias("station_id"),
        F.coalesce("d_station_latitude", "e_station_latitude").alias(
            "station_latitude"
        ),
        F.coalesce("d_station_longitude", "e_station_longitude").alias(
            "station_longitude"
        ),
        _merged_station_data(F.col("e_data"), F.col("d_data")).alias("station_data"),
    )


def dock_merge_fused_json(
    trips: DataFrame,
    existing_cond,
    delta_cond,
) -> DataFrame:
    """X1 + X2 deep merge, fused and flattened: ONE scan, TWO shuffles,
    zero joins, zero interpreted higher-order functions.

    The MapType forms (dock_merge / dock_merge_tagged) build both sides'
    nested station_data maps and then deep-merge them with map_zip_with —
    semantically direct, but map construction + lambda-comparator sorts
    run interpreted (outside whole-stage codegen) and the merge happens
    AFTER the expensive nesting. This form does the merge while the data
    is still relational, where new-wins is a codegen'd conditional max:

    - month level: delta's (station, year, month) row replaces existing's
      (update_dockmap.py:229-234 month union, new wins),
    - year level: delta's year sums replace existing's when delta has the
      year (year attrs replace),
    - station attrs: delta wins when present,

    then serializes straight to canonical JSON text with sort_array over
    string fragments (each fragment starts with its quoted key; keys are
    fixed-width tokens, so fragment order == key order) — every operator
    codegen-friendly. Plan shape: unpivoted single scan → map-side-combined
    aggregation to (side, station, year, month) grain [shuffle 1, reduced
    volume] → repartition(station_name) [shuffle 2, aggregated rows only]
    → three further aggregations all exchange-free because hash
    partitioning on station_name satisfies every downstream grouping's
    clustered distribution. At 100 TB nothing after shuffle 2 moves data.

    ``existing_cond``/``delta_cond`` must be disjoint boolean Columns.
    Output schema and values are identical to
    ``dock_export_json(dock_merge(existing, delta), canonical=True)`` —
    pinned by tests/test_dockmap equivalence.
    """
    tagged = trips.withColumn(
        "side", F.when(delta_cond, "d").when(existing_cond, "e")
    ).filter(F.col("side").isNotNull())
    monthly = dock_monthly(tagged, extra_keys=("side",)).repartition(
        "station_name"
    )

    d = F.col("side") == "d"
    e = F.col("side") == "e"

    def _smax(cond, col):
        return F.max(F.when(cond, F.col(col)))

    attrs = ("station_id", "station_latitude", "station_longitude")
    mrow = F.struct("month_total", "month_starts", "month_ends")
    month_grain = monthly.groupBy("station_name", "year", "month").agg(
        F.coalesce(
            F.max(F.when(d, mrow)), F.max(F.when(e, mrow))
        ).alias("mrow"),
        _smax(d, "month_starts").alias("d_ms"),
        _smax(d, "month_ends").alias("d_me"),
        _smax(e, "month_starts").alias("e_ms"),
        _smax(e, "month_ends").alias("e_me"),
        *[_smax(d, a).alias(f"d_{a}") for a in attrs],
        *[_smax(e, a).alias(f"e_{a}") for a in attrs],
    )

    month_frag = F.concat(
        F.lit('"'),
        F.col("month"),
        F.lit('":{"month_total":'),
        F.col("mrow.month_total").cast("string"),
        F.lit(',"month_starts":'),
        F.col("mrow.month_starts").cast("string"),
        F.lit(',"month_ends":'),
        F.col("mrow.month_ends").cast("string"),
        F.lit("}"),
    )
    year_grain = month_grain.groupBy("station_name", "year").agg(
        F.array_join(F.sort_array(F.collect_list(month_frag)), ",").alias("mjs"),
        # delta's yearly sums REPLACE existing's when delta has the year:
        # sum() skips the NULLs of an absent side, so it is null exactly
        # when that side has no month in this (station, year).
        F.coalesce(F.sum("d_ms"), F.sum("e_ms")).cast("long").alias("year_starts"),
        F.coalesce(F.sum("d_me"), F.sum("e_me")).cast("long").alias("year_ends"),
        *[F.max(f"d_{a}").alias(f"d_{a}") for a in attrs],
        *[F.max(f"e_{a}").alias(f"e_{a}") for a in attrs],
    )

    year_frag = F.concat(
        F.lit('"'),
        F.col("year"),
        F.lit('":{"year_starts":'),
        F.col("year_starts").cast("string"),
        F.lit(',"year_ends":'),
        F.col("year_ends").cast("string"),
        F.lit(',"months":{'),
        F.col("mjs"),
        F.lit("}}"),
    )
    station = year_grain.groupBy("station_name").agg(
        F.array_join(F.sort_array(F.collect_list(year_frag)), ",").alias("yjs"),
        *[
            F.coalesce(F.max(f"d_{a}"), F.max(f"e_{a}")).alias(a)
            for a in attrs
        ],
    )
    return station.select(
        "station_name",
        "station_id",
        "station_latitude",
        "station_longitude",
        F.concat(F.lit("{"), F.col("yjs"), F.lit("}")).alias("station_data"),
    )


def _sort_entries_by_key(entries):
    """Sort array<struct<key,...>> by key only — structs holding maps are
    not orderable, so sort_array can't be used after a map_zip_with."""
    return F.array_sort(
        entries,
        lambda a, b: F.when(a.key < b.key, -1).when(a.key > b.key, 1).otherwise(0),
    )


def canonical_station_data(col):
    """Re-sort both map levels by key so ``to_json`` output is canonical.

    map_zip_with emits union keys in first-map-then-extras order, which is
    not sorted after a merge; the oracle hash check (and any downstream
    consumer diffing JSON text) needs deterministic key order.
    """
    entries = F.transform(
        F.map_entries(col),
        lambda kv: F.struct(
            kv.key.alias("key"),
            F.struct(
                kv.value.year_starts.alias("year_starts"),
                kv.value.year_ends.alias("year_ends"),
                F.map_from_entries(
                    _sort_entries_by_key(F.map_entries(kv.value.months))
                ).alias("months"),
            ).alias("value"),
        ),
    )
    return F.map_from_entries(_sort_entries_by_key(entries))


def dock_export_json(dock: DataFrame, canonical: bool = False) -> DataFrame:
    """Edge serialization: nested MapType → JSON text, only at the sink
    (parity with the reference's stored JSON column, table_list.py:42)."""
    col = canonical_station_data(F.col("station_data")) if canonical else F.col("station_data")
    return dock.withColumn("station_data", F.to_json(col))
