"""Synthetic trips fixtures exercising the reference's quirky semantics
(SURVEY.md §5.2): era-variant column names, swapped lat/lon, blacklisted
stations, empty-string ids, zero/null coordinates, self-loop trips."""

from __future__ import annotations

from datetime import datetime

import pandas as pd

# In-bbox NYC points.
LAT_A, LON_A = 40.75, -73.99
LAT_B, LON_B = 40.70, -74.01
LAT_C, LON_C = 40.80, -73.95


def modern_era_pdf() -> pd.DataFrame:
    """Post-2020 schema: started_at/ended_at, member_casual, start_lat/lng.

    Because CLEAN_DICT routes start_lng→latitude-column (the reference's
    deliberate swap), rows here arrive 'swapped' and must be auto-repaired
    by the bbox CASE.
    """
    rows = [
        # normal member trip A->B
        dict(ride_id="r1", rideable_type="classic_bike",
             started_at="2023-07-01 08:00:00", ended_at="2023-07-01 08:15:00",
             start_station_name="Alpha", start_station_id="A1",
             end_station_name="Beta", end_station_id="B1",
             start_lat=LAT_A, start_lng=LON_A, end_lat=LAT_B, end_lng=LON_B,
             member_casual="member"),
        # casual trip B->C, different hour
        dict(ride_id="r2", rideable_type="electric_bike",
             started_at="2023-07-02 17:30:00", ended_at="2023-07-02 17:50:00",
             start_station_name="Beta", start_station_id="B1",
             end_station_name="Gamma", end_station_id="C1",
             start_lat=LAT_B, start_lng=LON_B, end_lat=LAT_C, end_lng=LON_C,
             member_casual="casual"),
        # repeat of A->B (drives trip_count=2)
        dict(ride_id="r3", rideable_type="classic_bike",
             started_at="2023-07-03 09:00:00", ended_at="2023-07-03 09:20:00",
             start_station_name="Alpha", start_station_id="A1",
             end_station_name="Beta", end_station_id="B1",
             start_lat=LAT_A, start_lng=LON_A, end_lat=LAT_B, end_lng=LON_B,
             member_casual="member"),
        # self-loop (excluded from TripTable, counted elsewhere)
        dict(ride_id="r4", rideable_type="classic_bike",
             started_at="2023-07-04 10:00:00", ended_at="2023-07-04 10:05:00",
             start_station_name="Alpha", start_station_id="A1",
             end_station_name="Alpha", end_station_id="A1",
             start_lat=LAT_A, start_lng=LON_A, end_lat=LAT_A, end_lng=LON_A,
             member_casual="casual"),
        # blacklisted depot station (filtered; db_importing.py:16-21)
        dict(ride_id="r5", rideable_type="classic_bike",
             started_at="2023-07-05 11:00:00", ended_at="2023-07-05 11:30:00",
             start_station_name="NYCBS Depot - STY - Valet Scan", start_station_id="D1",
             end_station_name="Beta", end_station_id="B1",
             start_lat=LAT_A, start_lng=LON_A, end_lat=LAT_B, end_lng=LON_B,
             member_casual="member"),
        # empty station id (filtered)
        dict(ride_id="r6", rideable_type="classic_bike",
             started_at="2023-07-06 12:00:00", ended_at="2023-07-06 12:30:00",
             start_station_name="Alpha", start_station_id="",
             end_station_name="Beta", end_station_id="B1",
             start_lat=LAT_A, start_lng=LON_A, end_lat=LAT_B, end_lng=LON_B,
             member_casual="member"),
        # zero coordinates (filtered)
        dict(ride_id="r7", rideable_type="classic_bike",
             started_at="2023-07-07 13:00:00", ended_at="2023-07-07 13:30:00",
             start_station_name="Alpha", start_station_id="A1",
             end_station_name="Beta", end_station_id="B1",
             start_lat=0.0, start_lng=0.0, end_lat=LAT_B, end_lng=LON_B,
             member_casual="member"),
        # wrong year (file_year gate filters it for a 2023 file)
        dict(ride_id="r8", rideable_type="classic_bike",
             started_at="2022-12-31 23:00:00", ended_at="2022-12-31 23:30:00",
             start_station_name="Alpha", start_station_id="A1",
             end_station_name="Beta", end_station_id="B1",
             start_lat=LAT_A, start_lng=LON_A, end_lat=LAT_B, end_lng=LON_B,
             member_casual="member"),
    ]
    return pd.DataFrame(rows)


def legacy_era_pdf() -> pd.DataFrame:
    """Pre-2020 schema: Start Time / Stop Time headers with spaces,
    usertype Subscriber/Customer, explicit station latitude/longitude
    column names, M/D/YYYY timestamps, no rideable_type."""
    rows = [
        {"Trip Duration": 600,
         "Start Time": "7/1/2019 8:00:00", "Stop Time": "7/1/2019 8:10:00",
         "Start Station ID": "A1", "Start Station Name": "Alpha",
         "Start Station Latitude": LAT_A, "Start Station Longitude": LON_A,
         "End Station ID": "B1", "End Station Name": "Beta",
         "End Station Latitude": LAT_B, "End Station Longitude": LON_B,
         "Usertype": "Subscriber"},
        {"Trip Duration": 900,
         "Start Time": "7/2/2019 9:30", "Stop Time": "7/2/2019 9:45",
         "Start Station ID": "C1", "Start Station Name": "Gamma",
         "Start Station Latitude": LAT_C, "Start Station Longitude": LON_C,
         "End Station ID": "A1", "End Station Name": "Alpha",
         "End Station Latitude": LAT_A, "End Station Longitude": LON_A,
         "Usertype": "Customer"},
    ]
    return pd.DataFrame(rows)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)
