"""Differential test: every registered query vs its DuckDB oracle —
the local stand-in for the driver's CORRECTNESS gate (SURVEY §5.2)."""

from __future__ import annotations

import pytest

from i3cols_spark.compare import compare_query
from i3cols_spark.operators import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        compare_query(df, ORACLES[name], sf_dir, name)
    else:
        # Rows-only check for non-SQL-expressible ops — still enforce
        # driver-canonicalizer sortability on the collected rows.
        from i3cols_spark.compare import assert_driver_sortable

        rows = [tuple(r) for r in df.collect()]
        assert_driver_sortable(df.columns, rows, name)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_schema_driver_safe(spark, sf_dir, name):
    """No registered query may emit a top-level array/map/struct column:
    the driver's canonicalizer pandas-sorts every output column and
    crashes on unhashable numpy arrays (CORRECTNESS_r01 q_array_collect
    / q_map_funcs).  Complex types belong upstream of the final
    projection; outputs are scalars."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = QUERIES[name](spark, sf_dir)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name} emits driver-unsortable columns: {bad}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue", "n_items"}


def test_surface_order_contract_first():
    """The driver consumes queries() in dict order under a finite
    budget (round 1 truncated at 50 entries, stranding 13 contract
    queries): all 60 SURVEY §2.3 names must precede every extra, and
    the surface must expose every registered query exactly once."""
    import __spark_entry__ as entrymod
    from i3cols_spark.operators import CONTRACT_QUERIES, EXTRA_QUERIES

    order = list(entrymod.queries())
    assert len(CONTRACT_QUERIES) == 60
    # Rotation-agnostic: the contract block may be internally reordered
    # (round 4 hoists the never-driver-tested E block first) but all 60
    # contract names must still precede every extra.
    assert set(order[:60]) == set(CONTRACT_QUERIES)
    assert sorted(order) == sorted(QUERIES)
    assert set(order[60:]) == set(EXTRA_QUERIES) | (
        set(QUERIES) - set(CONTRACT_QUERIES) - set(EXTRA_QUERIES)
    )
    # Every contract query has an oracle entry except the declared
    # weak-by-design ones (SURVEY §2.3: approx_distinct + minhash).
    from i3cols_spark.operators import ORACLES
    weak_ok = {"q_agg_approx_distinct", "q_dedup_near_minhash"}
    missing = [n for n in CONTRACT_QUERIES if n not in ORACLES and n not in weak_ok]
    assert not missing, f"contract queries without oracle: {missing}"
