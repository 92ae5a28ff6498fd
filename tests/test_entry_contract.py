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
    # Since r5 every catalog entry carries a value-checked oracle
    # (ivf_kmeans_cells, the last rows-only holdout, graduated via the
    # unrolled-CTE oracle) — nothing un-backed may sit in the verify
    # queue's curated front.
    assert unbacked == [], f"front-of-queue entries without oracle: {unbacked}"


def test_queries_and_oracles_cover_catalog():
    qs = entry.queries()
    assert set(qs) == set(CATALOG)
    oracles = entry.oracle_sql()
    assert set(oracles) == {n for n, s in CATALOG.items() if s.oracle}


def test_sql_backed_outputs_are_scalar_typed(spark):
    """The driver's pandas canonicalizer sorts/hashes every output column;
    array/map/struct cells raise `unhashable type: 'list'` and void the
    correctness row (r3: matryoshka/int8/sketch). Driver-visible queries
    must emit scalar columns only — explode or serialize at the edge."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name, spec in CATALOG.items():
        if spec.oracle is None:
            continue
        df = spec.build(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"complex-typed driver-visible columns: {bad}"
