"""Bucketing: pre-shuffled table layout ⇒ co-located joins with NO
exchange (SCALE.md: 'co-locate joins via bucketing'). This is the
100 TB lever for repeated joins on the same key — pay the shuffle once at
write time, never again at read time."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # spark.sql.warehouse.dir is static; tables land in ./spark-warehouse
    # (tiny, sf0.001) and are dropped in teardown.
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("orders_b")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("customer_b")
    )
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, ct = bucketed_tables
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ot).join(
            spark.table(ct), spark.table(ot).o_custkey == spark.table(ct).c_custkey
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join over plain parquet must exchange both sides."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
