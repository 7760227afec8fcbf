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


def test_surface_order_round10_rotation():
    """The driver consumes queries() in dict order under a 50-row
    budget.  After round 9, the names without official CORRECTNESS
    rows are the 6 _R10_DEFERRED + 55 POST_R9_ADDITIONS, plus the
    three round-10 output-contract flips (q_dedup_simhash,
    q_dedup_minhash_cluster_rep, q_similarity_ann_ivfpq — rows-only
    until their audited-bound oracle forms landed this round, so
    they need fresh official rows like every contract flip before
    them).  The window (VERDICT r09 items 2+5) is recomputed here
    from the committed artifacts so a drifted rotation fails loudly:
      * slots 1-3 are the flips — every one must now HAVE an oracle;
      * slots 4-9 are the six _R10_DEFERRED;
      * every non-flip window name must have NO row in any committed
        artifact r1-r9 (first-time official evidence);
      * every window name must HAVE a DuckDB oracle;
      * the only oracle-backed never-checked names left OUT are the
        15 _R11_DEFERRED (POST_R9 overflow) — nothing silently
        dropped, and the rows-only set is now EMPTY."""
    import json
    import pathlib

    import __spark_entry__ as entrymod
    from i3cols_spark.operators import CONTRACT_QUERIES
    from i3cols_spark.operators.registry import (
        _R10_DEFERRED,
        _R10_FLIPS,
        _R10_PRIORITY,
        _R10_ROWS_ONLY,
        _R11_DEFERRED,
        POST_R9_ADDITIONS,
    )

    order = list(entrymod.queries())
    assert len(CONTRACT_QUERIES) == 60
    assert len(_R10_PRIORITY) == 50
    assert len(set(_R10_PRIORITY)) == 50
    assert order[:50] == list(_R10_PRIORITY)
    assert sorted(order) == sorted(QUERIES)

    repo = pathlib.Path(__file__).resolve().parent.parent
    newest: dict[str, int] = {}
    for r in (1, 2, 3, 4, 5, 6, 7, 8, 9):
        art = repo / f"CORRECTNESS_r0{r}.json"
        if art.exists():
            for name in json.loads(art.read_text()):
                newest[name] = r

    window = list(_R10_PRIORITY)
    assert tuple(window[:3]) == _R10_FLIPS
    assert tuple(window[3:9]) == _R10_DEFERRED

    already_checked = [n for n in window[3:] if n in newest]
    assert not already_checked, (
        f"window names that already have official rows: {already_checked}"
    )

    # Every window slot must produce a hash row, never a no_oracle
    # record — and the rows-only set is empty after the flips.
    no_oracle_in_window = [n for n in window if n not in ORACLES]
    assert not no_oracle_in_window, no_oracle_in_window
    assert _R10_ROWS_ONLY == ()
    rows_only_left = [n for n in QUERIES if n not in ORACLES]
    assert rows_only_left == [], rows_only_left

    # Accounting: every name with no official row is in the window,
    # explicitly deferred to round 11, or registered AFTER the r10
    # window froze (POST_R10_ADDITIONS) — nothing silently dropped.
    from i3cols_spark.operators.registry import POST_R10_ADDITIONS

    never_checked = [n for n in QUERIES if n not in newest]
    left_out = sorted(set(never_checked) - set(window))
    assert left_out == sorted((*_R11_DEFERRED, *POST_R10_ADDITIONS)), left_out
    assert len(_R11_DEFERRED) == 15
    assert set(_R11_DEFERRED) <= set(POST_R9_ADDITIONS)

    # Every contract query has an oracle entry.
    missing = [n for n in CONTRACT_QUERIES if n not in ORACLES]
    assert not missing, f"contract queries without oracle: {missing}"


def test_readme_surface_count_in_sync():
    """Surface-count tripwire (VERDICT r09 item 7): round 9 needed
    three manual 'count sync' commits because README counts drifted
    from the registry.  One source of truth: every '<N> registered
    entries' mention in README.md must equal len(surface_order()),
    and the registry must be fully oracle-backed (the round-10
    rows-only flip made that a standing invariant)."""
    import pathlib
    import re

    from i3cols_spark.operators.registry import surface_order

    n = len(surface_order())
    assert len(QUERIES) == n
    assert len(ORACLES) == n, sorted(set(QUERIES) - set(ORACLES))

    readme = (
        pathlib.Path(__file__).resolve().parent.parent / "README.md"
    ).read_text()
    claimed = {int(m) for m in re.findall(r"(\d+) registered entries", readme)}
    assert claimed == {n}, f"README claims {claimed}, registry has {n}"
    distinct = {
        int(m) for m in re.findall(r"\((\d+) distinct operators", readme)
    }
    assert distinct == {n - 1}, distinct
