"""Plan-quality tests (SURVEY §4.2) — assert the physical properties
that matter at 100 TB, not just result correctness: pushdown, pruning,
join strategy.  A regression here is correct-but-100×-slower."""

from __future__ import annotations

from i3cols_spark.operators import QUERIES
from i3cols_spark.plans.checks import (
    explain_str,
    has_broadcast_hash_join,
    has_sort_merge_join,
    pushed_filters,
    read_schema_columns,
)


def test_filter_pushed_to_parquet_scan(spark, sf_dir):
    df = QUERIES["q_filter_simple"](spark, sf_dir)
    pushed = pushed_filters(df)
    assert any("l_quantity" in f and "GreaterThan" in f for f in pushed), pushed


def test_projection_prunes_read_schema(spark, sf_dir):
    df = QUERIES["q_scan_project"](spark, sf_dir)
    schemas = read_schema_columns(df)
    assert schemas, "no ReadSchema found"
    for cols in schemas.values():
        assert set(cols) == {
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        }, cols


def test_star_join_broadcasts_dims_and_aggregates_partially(spark, sf_dir):
    df = QUERIES["q_join_multiway_star"](spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    # partial+final aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2
    # the orders date filter must reach its scan
    assert any("o_orderdate" in f for f in pushed_filters(df))


def test_fact_fact_join_is_sort_merge(spark, sf_dir):
    assert has_sort_merge_join(QUERIES["q_join_sortmerge"](spark, sf_dir))


def test_dim_join_is_broadcast(spark, sf_dir):
    assert has_broadcast_hash_join(QUERIES["q_join_broadcast"](spark, sf_dir))


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = explain_str(QUERIES["q_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "global sort planned for top-k"


def test_range_join_is_keyed_not_cartesian(spark, sf_dir):
    plan = explain_str(QUERIES["q_join_theta_range"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semi_anti_plans(spark, sf_dir):
    semi = explain_str(QUERIES["q_join_semi"](spark, sf_dir))
    anti = explain_str(QUERIES["q_join_anti"](spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti
