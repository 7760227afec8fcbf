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


def test_surface_order_round5_rotation():
    """The driver consumes queries() in dict order under a 50-row
    budget.  Round 5 leads with the evidence-rotation block (VERDICT
    r04 item 1 / ADVICE r04 item 4): the 37 names with NO official
    CORRECTNESS row in rounds 1–4 plus the 13 stalest, pinned here by
    recomputing the never-checked set from the committed artifacts so
    a drifted rotation fails loudly."""
    import json
    import pathlib

    import __spark_entry__ as entrymod
    from i3cols_spark.operators import CONTRACT_QUERIES, EXTRA_QUERIES
    from i3cols_spark.operators.registry import _R5_PRIORITY, POST_R5_ADDITIONS

    order = list(entrymod.queries())
    assert len(CONTRACT_QUERIES) == 60
    assert len(_R5_PRIORITY) == 50
    assert len(set(_R5_PRIORITY)) == 50
    assert order[:50] == list(_R5_PRIORITY)
    assert sorted(order) == sorted(QUERIES)

    repo = pathlib.Path(__file__).resolve().parent.parent
    checked: set[str] = set()
    for r in (1, 2, 3, 4):
        art = repo / f"CORRECTNESS_r0{r}.json"
        if art.exists():
            checked |= set(json.loads(art.read_text()))
    registered = set(CONTRACT_QUERIES) | set(EXTRA_QUERIES)
    # Operators added AFTER the rotation was frozen can't fit in the
    # already-full 50-slot window; they're pinned as the round-6
    # rotation's first candidates instead.
    never = registered - checked - set(POST_R5_ADDITIONS)
    # All never-officially-checked pre-rotation names must sit inside
    # the priority block (the budget window), so round 5 closes the
    # evidence gap.
    assert never <= set(_R5_PRIORITY), sorted(never - set(_R5_PRIORITY))
    assert set(POST_R5_ADDITIONS) <= registered
    assert not set(POST_R5_ADDITIONS) & set(_R5_PRIORITY)

    # Every contract query has an oracle entry except the declared
    # weak-by-design ones (SURVEY §2.3: approx_distinct + minhash).
    from i3cols_spark.operators import ORACLES
    weak_ok = {"q_agg_approx_distinct", "q_dedup_near_minhash"}
    missing = [n for n in CONTRACT_QUERIES if n not in ORACLES and n not in weak_ok]
    assert not missing, f"contract queries without oracle: {missing}"
