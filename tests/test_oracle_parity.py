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


def test_surface_order_round7_rotation():
    """The driver consumes queries() in dict order under a 50-row
    budget.  After round 6 every registered name has an official green
    row and the ages split 50 (r6) / 50 (r5) / 50 (r4); round 7's
    window is exactly the 50 OLDEST-evidence names (VERDICT r06
    item 1) — pinned here by recomputing each name's newest official
    round from the committed artifacts so a drifted rotation fails
    loudly.  Operators registered in round 7 itself
    (POST_R7_ADDITIONS) wait for the r8 window, the POST_R5
    precedent."""
    import json
    import pathlib

    import __spark_entry__ as entrymod
    from i3cols_spark.operators import CONTRACT_QUERIES, EXTRA_QUERIES
    from i3cols_spark.operators.registry import _R7_PRIORITY, POST_R7_ADDITIONS

    order = list(entrymod.queries())
    assert len(CONTRACT_QUERIES) == 60
    assert len(_R7_PRIORITY) == 50
    assert len(set(_R7_PRIORITY)) == 50
    assert order[:50] == list(_R7_PRIORITY)
    assert sorted(order) == sorted(QUERIES)

    repo = pathlib.Path(__file__).resolve().parent.parent
    newest: dict[str, int] = {}
    for r in (1, 2, 3, 4, 5, 6):
        art = repo / f"CORRECTNESS_r0{r}.json"
        if art.exists():
            for name in json.loads(art.read_text()):
                newest[name] = r
    # Round-7-new operators have no official row yet by construction;
    # everything older must be covered, oldest first.
    pre_r7 = set(QUERIES) - set(POST_R7_ADDITIONS)
    unchecked = pre_r7 - set(newest)
    assert not unchecked, f"pre-r7 names with no official row: {sorted(unchecked)}"
    oldest_50 = set(sorted(pre_r7, key=lambda n: (newest[n], n))[:50])
    assert set(_R7_PRIORITY) == oldest_50, (
        sorted(oldest_50 - set(_R7_PRIORITY)),
        sorted(set(_R7_PRIORITY) - oldest_50),
    )
    # The window must be strictly staler than everything outside it.
    max_in = max(newest[n] for n in _R7_PRIORITY)
    min_out = min(newest[n] for n in pre_r7 - set(_R7_PRIORITY))
    assert max_in <= min_out

    # Every contract query has an oracle entry except the declared
    # weak-by-design ones (SURVEY §2.3: approx_distinct + minhash).
    from i3cols_spark.operators import ORACLES
    weak_ok = {"q_agg_approx_distinct", "q_dedup_near_minhash"}
    missing = [n for n in CONTRACT_QUERIES if n not in ORACLES and n not in weak_ok]
    assert not missing, f"contract queries without oracle: {missing}"
