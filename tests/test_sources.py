from __future__ import annotations

import io
import zipfile

from citibike_deep_dive_spark.sources.discovery import (
    CandidateFile,
    discover_listing,
    is_candidate,
    parse_file_name,
    parse_table_name,
)
from citibike_deep_dive_spark.sources.state import (
    YearState,
    advance_state,
    load_state,
    new_files,
    save_state,
)
from citibike_deep_dive_spark.sources.zips import iter_csv_members


def test_parse_file_name():
    assert parse_file_name("202307-citibike-tripdata.csv.zip") == (2023, 7)
    assert parse_file_name("2023-citibike-tripdata.zip") == (2023, None)
    assert parse_file_name("JC-202307-citibike-tripdata.csv.zip") is None
    assert parse_file_name("garbage.zip") is None


def test_parse_table_name_no_crash_on_mismatch():
    assert parse_table_name("Citibike_2023_07") == (2023, 7)
    assert parse_table_name("Citibike_2023") == (2023, None)
    # reference crashed / returned inconsistent values here (SURVEY.md F8)
    assert parse_table_name("NotATable") == (None, None)


def test_listing_filters_and_order():
    keys = [
        "202402-citibike-tripdata.csv.zip",
        "202312-citibike-tripdata.csv.zip",
        "JC-202402-citibike-tripdata.csv.zip",  # Jersey City: excluded
        "index.html",
        "2012-citibike-tripdata.zip",  # pre-2013: excluded
        "2023-citibike-tripdata.zip",
    ]
    files = discover_listing(keys)
    assert [f.sort_key for f in files] == [202300, 202312, 202402]
    assert not is_candidate("index.html")


def test_state_machine_gate():
    candidates = [
        CandidateFile("202301-...", 2023, 1),
        CandidateFile("202302-...", 2023, 2),
        CandidateFile("2022-...", 2022, None),
    ]
    state: dict[int, YearState] = {}
    fresh = new_files(candidates, state)
    assert len(fresh) == 3
    # process the 2022 yearly file -> complete
    state = advance_state(state, fresh[0])
    assert state[2022].complete
    # process 2023-01 -> month set {1}, incomplete
    state = advance_state(state, fresh[1])
    assert state[2023] == YearState(2023, frozenset({1}), False)
    # re-diff: only 2023-02 is new; replay returns empty list (never False)
    remaining = new_files(candidates, state)
    assert [(f.year, f.month) for f in remaining] == [(2023, 2)]
    state = advance_state(state, remaining[0])
    assert new_files(candidates, state) == []


def test_state_gate_out_of_order_month():
    """Exact-match gate (new_file_check.py:27-43): a month published AFTER a
    later month was ingested is still NEW — a max-month watermark would
    silently drop it (ADVICE r1)."""
    state: dict[int, YearState] = {}
    state = advance_state(state, CandidateFile("202305-...", 2023, 5))
    late = CandidateFile("202303-...", 2023, 3)
    fresh = new_files([late, CandidateFile("202305-...", 2023, 5)], state)
    assert [(f.year, f.month) for f in fresh] == [(2023, 3)]
    state = advance_state(state, late)
    assert state[2023] == YearState(2023, frozenset({3, 5}), False)
    assert new_files([late], state) == []


def test_state_roundtrip(spark, tmp_path):
    path = str(tmp_path / "status_state")
    assert load_state(spark, path) == {}  # missing table -> empty, no crash
    state = {
        2023: YearState(2023, frozenset({3, 7}), False),
        2022: YearState(2022, frozenset(), True),
    }
    save_state(spark, state, path)
    assert load_state(spark, path) == state


def _zip_bytes(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, payload in members.items():
            zf.writestr(name, payload)
    return buf.getvalue()


def test_zip_extraction_nested_and_macosx():
    inner = _zip_bytes({"inner.csv": b"a,b\n1,2\n"})
    data = _zip_bytes(
        {
            "top.csv": b"x,y\n3,4\n",
            "__MACOSX/top.csv": b"junk",
            ".hidden.csv": b"junk",
            "nested.zip": inner,
            "readme.txt": b"nope",
        }
    )
    members = dict(iter_csv_members(data))
    assert set(members) == {"top.csv", "inner.csv"}
    assert members["inner.csv"] == b"a,b\n1,2\n"


def test_zip_distributed_read(spark, tmp_path):
    from citibike_deep_dive_spark.sources.zips import read_zips_distributed

    p = tmp_path / "a.zip"
    p.write_bytes(_zip_bytes({"m1.csv": b"a,b\n1,2\n", "m2.csv": b"a,b\n3,4\n"}))
    out = read_zips_distributed(spark, str(tmp_path / "*.zip")).collect()
    assert sorted(r.member for r in out) == ["m1.csv", "m2.csv"]
    assert all(r.csv.startswith(b"a,b") for r in out)


def test_distributed_zip_to_trips_end_to_end(spark, tmp_path):
    """S4 path 2 complete: binaryFile → executor-side unzip → executor-side
    CSV parse → normalize_trips; row-parity with the staged path."""
    import zipfile as zf

    from citibike_deep_dive_spark.normalize import normalize_trips
    from citibike_deep_dive_spark.sources.zips import (
        extract_to_staging,
        parse_csv_members_distributed,
        read_staged_csvs,
        read_zips_distributed,
    )
    from tests.trips_fixture import modern_era_pdf

    pdf = modern_era_pdf()
    zpath = tmp_path / "202307-citibike-tripdata.csv.zip"
    with zf.ZipFile(zpath, "w") as z:
        z.writestr("202307-citibike-tripdata.csv", pdf.to_csv(index=False))

    members = read_zips_distributed(spark, str(tmp_path / "*.zip"))
    raw = parse_csv_members_distributed(members, [str(c) for c in pdf.columns])
    distributed = normalize_trips(raw, file_year="2023")

    staged = extract_to_staging(str(zpath), str(tmp_path / "staging"))
    via_staging = normalize_trips(read_staged_csvs(spark, staged), file_year="2023")

    d = sorted(repr(r) for r in distributed.collect())
    s = sorted(repr(r) for r in via_staging.collect())
    assert d == s and len(d) > 0
