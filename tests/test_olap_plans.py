"""Plan-shape regression for the multi-join OLAP suite (plans/olap.py).

Correctness is covered by the oracle-parity suite; these tests pin the
PHYSICAL properties that make the queries scale — the top-k never
becomes a global sort, the tiny dims stay broadcast, and the per-table
filters reach the parquet scans."""

from __future__ import annotations

import pytest

from citibike_deep_dive_spark.plans import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return CATALOG[name].build(spark, SF)._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", ["shipping_priority_topk", "returned_items_topk"])
def test_topk_is_take_ordered_not_global_sort(spark, name):
    plan = _plan(spark, name)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    # A global Sort before the limit would mean a single-reducer ordering.
    assert "Sort [revenue" not in plan, plan[:2000]


def test_local_supplier_volume_broadcasts_dims_only(spark):
    """With size-based auto-broadcast OFF (the 100 TB regime, where every
    fact table exceeds any threshold), the explicit F.broadcast on the
    nation⋈region dim must survive — and be the ONLY broadcast: the fact
    chain joins by shuffle."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "local_supplier_volume")
        assert "BroadcastHashJoin" in plan, plan[:2000]
        for frag in plan.split("BroadcastExchange")[1:]:
            scan_zone = frag.split("Exchange hashpartitioning")[0]
            assert "lineitem.parquet" not in scan_zone, plan[:3000]
            assert "orders.parquet" not in scan_zone, plan[:3000]
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_pricing_summary_pushes_shipdate_filter(spark):
    plan = _plan(spark, "pricing_summary_report")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, (
        plan[:2000]
    )


def test_order_priority_semi_is_left_semi(spark):
    plan = _plan(spark, "order_priority_semi")
    assert "LeftSemi" in plan, plan[:2000]
    # The non-equi correlate must ride the join as a residual, not force
    # a nested-loop over the fact table.
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_unpivot_is_single_scan_expand(spark):
    plan = _plan(spark, "unpivot_lineitem_measures")
    assert "Expand" in plan, plan[:2000]
    assert plan.count("lineitem.parquet") == 1, plan[:2000]


def test_grouping_sets_is_single_scan_expand(spark):
    plan = _plan(spark, "grouping_sets_doc_counts")
    assert "Expand" in plan, plan[:2000]
    assert plan.count("documents.parquet") == 1, plan[:2000]


def test_min_cost_supplier_argmin_has_no_window(spark):
    """Q2's per-part argmin must be the struct-min inside the hash
    aggregate — a window rank would re-shuffle the quote frame and add a
    sort per partition."""
    plan = _plan(spark, "min_cost_supplier_per_part")
    assert "Window" not in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_product_type_profit_fact_never_shuffles_before_agg(spark):
    """Q9: with all three dims broadcast, the only hashpartitioning
    exchange must be the final (nation, year) aggregate — no fact-side
    join shuffle."""
    plan = _plan(spark, "product_type_profit")
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]
    assert "PushedFilters: [IsNotNull(p_name), StringContains(p_name,widget)" in plan or \
        "StringContains(p_name,widget)" in plan, plan[:2000]


def test_important_part_share_total_is_broadcast(spark):
    """Q11: the global-total threshold must come back as a broadcast,
    not a shuffle join of the part-grain frame with itself."""
    plan = _plan(spark, "important_part_value_share")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan[:2000]


def test_supplier_count_denylist_is_broadcast_anti(spark):
    plan = _plan(spark, "supplier_count_by_part_attrs")
    assert "LeftAnti, BuildRight" in plan, plan[:2000]


def test_rrf_ranks_only_k_bounded_frames(spark):
    """Hybrid RRF: both retriever lists must reduce via
    TakeOrderedAndProject (per-partition heap) BEFORE any window rank —
    the unpartitioned row_number windows are legal only because they run
    over ≤100-row frames."""
    plan = _plan(spark, "rrf_hybrid_retrieval")
    assert plan.count("TakeOrderedAndProject") == 2, plan[:3000]
