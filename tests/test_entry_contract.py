"""Driver-contract guards: the curated verify ordering must stay valid —
a renamed catalog entry silently dropping out of VERIFY_FIRST would waste
that round's driver-verification budget."""

from __future__ import annotations

import __spark_entry__ as entry
from citibike_deep_dive_spark.plans import CATALOG


def test_verify_first_names_all_exist():
    missing = [n for n in entry.VERIFY_FIRST if n not in CATALOG]
    assert not missing, f"VERIFY_FIRST names not in CATALOG: {missing}"


def test_verify_first_has_no_duplicates():
    assert len(entry.VERIFY_FIRST) == len(set(entry.VERIFY_FIRST))


def test_front_of_queue_is_curated_and_oracle_backed():
    names = list(entry.queries())
    k = len(entry.VERIFY_FIRST)
    assert names[:k] == entry.VERIFY_FIRST
    oracles = entry.oracle_sql()
    unbacked = [n for n in names[:k] if n not in oracles]
    assert not unbacked, f"front-of-queue entries without oracle: {unbacked}"


def test_queries_and_oracles_cover_catalog():
    qs = entry.queries()
    assert set(qs) == set(CATALOG)
    oracles = entry.oracle_sql()
    assert set(oracles) == {n for n, s in CATALOG.items() if s.oracle}
