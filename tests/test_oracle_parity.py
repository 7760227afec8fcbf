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


def test_surface_order_round8_rotation():
    """The driver consumes queries() in dict order under a 50-row
    budget.  Round 7 grew the surface from 150 to 231 names, leaving
    the 81 POST_R7_ADDITIONS with zero official CORRECTNESS rows;
    round 8's window (VERDICT r07 item 1) is spent entirely on
    first-time official evidence — recomputed here from the committed
    artifacts so a drifted rotation fails loudly:
      * every window name except q_agg_approx_distinct must have NO
        row in any committed artifact (never officially checked);
      * q_agg_approx_distinct holds slot 1 because its only r7 row is
        the erring ``no_oracle`` record and its output contract
        changed to the oracle-checkable ±5%-bound form (item 5);
      * every window name must HAVE a DuckDB oracle — rows-only names
        waste slots on ``no_oracle`` records and are excluded;
      * window ∖ {q_agg_approx_distinct} ⊆ POST_R7_ADDITIONS, and the
        oracle-checked overflow (29 names) waits for round 9."""
    import json
    import pathlib

    import __spark_entry__ as entrymod
    from i3cols_spark.operators import CONTRACT_QUERIES, EXTRA_QUERIES
    from i3cols_spark.operators.registry import (
        _POST_R7_ROWS_ONLY,
        _R8_PRIORITY,
        POST_R7_ADDITIONS,
    )

    order = list(entrymod.queries())
    assert len(CONTRACT_QUERIES) == 60
    assert len(_R8_PRIORITY) == 50
    assert len(set(_R8_PRIORITY)) == 50
    assert order[:50] == list(_R8_PRIORITY)
    assert sorted(order) == sorted(QUERIES)

    repo = pathlib.Path(__file__).resolve().parent.parent
    newest: dict[str, int] = {}
    for r in (1, 2, 3, 4, 5, 6, 7):
        art = repo / f"CORRECTNESS_r0{r}.json"
        if art.exists():
            for name in json.loads(art.read_text()):
                newest[name] = r

    window = list(_R8_PRIORITY)
    assert window[0] == "q_agg_approx_distinct"
    never_checked = [n for n in window[1:] if n in newest]
    assert not never_checked, (
        f"window names that already have official rows: {never_checked}"
    )
    not_post_r7 = [n for n in window[1:] if n not in POST_R7_ADDITIONS]
    assert not_post_r7 == [], not_post_r7

    # Slots must not be wasted on rows-only names.
    no_oracle_in_window = [n for n in window if n not in ORACLES]
    assert not no_oracle_in_window, no_oracle_in_window
    assert not set(_POST_R7_ROWS_ONLY) & set(window)
    assert all(n not in ORACLES for n in _POST_R7_ROWS_ONLY)

    # Every POST_R7 name is either in the window, rows-only by
    # design, or explicit r9 overflow — nothing silently dropped.
    overflow = [
        n
        for n in POST_R7_ADDITIONS
        if n not in set(window) and n not in _POST_R7_ROWS_ONLY
    ]
    assert len(overflow) == 29, (len(overflow), overflow)
    assert all(n in ORACLES for n in overflow)

    # Every contract query has an oracle entry except the declared
    # weak-by-design one (SURVEY §2.3: minhash LSH, whose output set
    # is defined by the engine-side 64-bit hash family; construction
    # pinned by q_text_minhash_signature + q_dedup_lsh_bucket_audit).
    weak_ok = {"q_dedup_near_minhash"}
    missing = [n for n in CONTRACT_QUERIES if n not in ORACLES and n not in weak_ok]
    assert not missing, f"contract queries without oracle: {missing}"
