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


def test_surface_order_round6_rotation():
    """The driver consumes queries() in dict order under a 50-row
    budget.  Round 6 leads with the evidence-rotation block (VERDICT
    r05 item 1): every name with NO official CORRECTNESS row after
    rounds 1–5 (the 32 POST_R5_ADDITIONS plus round-6-new operators),
    then q_udaf_grouped (newest official row = the r03 crash) and the
    stalest r1/r3 names — pinned here by recomputing the checked set
    from the committed artifacts so a drifted rotation fails loudly."""
    import json
    import pathlib

    import __spark_entry__ as entrymod
    from i3cols_spark.operators import CONTRACT_QUERIES, EXTRA_QUERIES
    from i3cols_spark.operators.registry import _R6_PRIORITY, POST_R5_ADDITIONS, R6_NEW

    order = list(entrymod.queries())
    assert len(CONTRACT_QUERIES) == 60
    assert len(_R6_PRIORITY) == 50
    assert len(set(_R6_PRIORITY)) == 50
    assert order[:50] == list(_R6_PRIORITY)
    assert sorted(order) == sorted(QUERIES)

    repo = pathlib.Path(__file__).resolve().parent.parent
    checked: set[str] = set()
    for r in (1, 2, 3, 4, 5):
        art = repo / f"CORRECTNESS_r0{r}.json"
        if art.exists():
            checked |= set(json.loads(art.read_text()))
    # Every registered name with no official row from any round must
    # sit inside the round-6 window, so the evidence gap closes.
    never = set(QUERIES) - checked
    assert never <= set(_R6_PRIORITY), sorted(never - set(_R6_PRIORITY))
    assert set(POST_R5_ADDITIONS) <= set(_R6_PRIORITY)
    assert set(R6_NEW) <= set(_R6_PRIORITY)
    # Stale-evidence backfill: the r1/r3-checked names + the udaf whose
    # newest official row was a crash.
    stale = {
        "q_udaf_grouped", "q_source_npy_scan", "q_udtf_python",
        "q_window_distribution", "q_array_collect", "q_array_explode",
        "q_array_hof", "q_case_when", "q_json_extract", "q_map_funcs",
        "q_struct_nested", "q_udf_scalar", "q_udtf_expand",
    }
    assert stale <= set(_R6_PRIORITY)

    # Every contract query has an oracle entry except the declared
    # weak-by-design ones (SURVEY §2.3: approx_distinct + minhash).
    from i3cols_spark.operators import ORACLES
    weak_ok = {"q_agg_approx_distinct", "q_dedup_near_minhash"}
    missing = [n for n in CONTRACT_QUERIES if n not in ORACLES and n not in weak_ok]
    assert not missing, f"contract queries without oracle: {missing}"
