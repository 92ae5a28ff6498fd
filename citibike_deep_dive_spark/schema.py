"""Canonical trip schema + normalization constants.

Re-expresses the reference's fixed 12-column Arrow schema and header
normalization maps (reference:
citibike_data_process/data_processing/setup/clean_up.py:6-41) and the
ingestion-time constants of db_importing.py (NYC bounding box, station
blacklist, user-type mapping; reference:
citibike_data_process/data_processing/ingestion/db_importing.py:11-28,45-71).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical 12-column trip schema (clean_up.py:20-41). Counts and keys are
# strings/doubles exactly as the reference stores them; at 100 TB the fact
# table is partitioned by (year, month) instead of indexed.
TRIP_SCHEMA = T.StructType(
    [
        T.StructField("start_time", T.TimestampType()),
        T.StructField("end_time", T.TimestampType()),
        T.StructField("start_station_name", T.StringType()),
        T.StructField("start_station_id", T.StringType()),
        T.StructField("end_station_name", T.StringType()),
        T.StructField("end_station_id", T.StringType()),
        T.StructField("start_station_latitude", T.DoubleType()),
        T.StructField("start_station_longitude", T.DoubleType()),
        T.StructField("end_station_latitude", T.DoubleType()),
        T.StructField("end_station_longitude", T.DoubleType()),
        T.StructField("user_type", T.StringType()),
        T.StructField("rideable_type", T.StringType()),
    ]
)

CANONICAL_COLUMNS = [f.name for f in TRIP_SCHEMA.fields]

# Header rename map (clean_up.py:6-18), verbatim. NOTE the reference's
# deliberate quirk: modern-era ``start_lng``/``start_lat`` land in *swapped*
# canonical columns (START side only — the END side maps straight through);
# the bbox repair below un-swaps the start pair row-wise (clean_up.py:8-13 +
# db_importing.py:45-71). We preserve that two-step behavior exactly.
CLEAN_DICT = {
    "member_casual": "user_type",
    "usertype": "user_type",
    "started_at": "start_time",
    "starttime": "start_time",
    "ended_at": "end_time",
    "stoptime": "end_time",
    "stop_time": "end_time",
    "start_lng": "start_station_latitude",
    "start_lat": "start_station_longitude",
    "end_lat": "end_station_latitude",
    "end_lng": "end_station_longitude",
}

# NYC bounding box used by the coordinate auto-repair, literals verbatim
# from db_importing.py:48-71.
NYC_LAT_MIN, NYC_LAT_MAX = 40.478245113529454, 40.98852055760176
NYC_LON_MIN, NYC_LON_MAX = -74.25383719445274, -73.59127683334592

# Station blacklist applied at load (db_importing.py:16-21), verbatim.
STATION_BLACKLIST = [
    "8D QC Station 01",
    "SSP - Basement",
    "NYCBS Depot - STY - Valet Scan",
    "333 Johnson TEST 1",
    "8D Mobile 01",
    "8D OPS 01",
]

# user_type normalization CASE (db_importing.py:11-14,25-28):
# member→subscriber, casual→customer, else lower(passthrough).
USER_TYPE_MAP = {"member": "subscriber", "casual": "customer"}

# Timestamp parse formats with/without seconds (clean_up.py:47-50).
TS_FORMATS = ["M/d/yyyy H:mm:ss", "M/d/yyyy H:mm", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm:ss.SSS"]

# Month abbreviations for strftime('%b') parity, locale-pinned
# (db_importing.py:75 uses %b — 'Jan'..'Dec').
MONTH_ABBREV = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]
