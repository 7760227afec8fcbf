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


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """write_bucketed pays the shuffle once: a later self-key join of two
    bucketed tables plans with zero Exchange operators."""
    import shutil

    from i3cols_spark.sources.ingest import write_bucketed
    from i3cols_spark.sources.tables import table

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    # merge hint: at fixture scale Catalyst would broadcast the tiny side
    # (also shuffle-free, but that wouldn't prove bucket co-location).
    bl, bo = spark.table("b_lineitem").hint("merge"), spark.table("b_orders")
    joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).groupBy("l_orderkey").count()
    import re

    plan = explain_str(joined)
    assert "SortMergeJoin" in plan
    # formatted plan names shuffle nodes "(n) Exchange" (BroadcastExchange
    # is a different node name and wouldn't match).
    assert not re.search(r"\(\d+\) Exchange\b", plan), plan
    assert joined.count() > 0
    # contrast: the same join over non-bucketed parquet does shuffle
    nb = li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)
    assert re.search(r"\(\d+\) Exchange\b", explain_str(nb))


def test_salted_join_matches_plain_join(spark, sf_dir):
    from i3cols_spark.sources.ingest import salted_join
    from i3cols_spark.sources.tables import table

    ev = table(spark, sf_dir, "events").select("user_id", "event_id")
    dim = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "user_total")
    )
    plain = ev.join(dim, "user_id").select("event_id", "user_total")
    salted = salted_join(ev, dim, "user_id").select("event_id", "user_total")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
