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


def test_surface_order_round9_rotation():
    """The driver consumes queries() in dict order under a 50-row
    budget.  After round 8, the names without official CORRECTNESS
    rows are the 29 POST_R7 overflow + 24 POST_R8_ADDITIONS, plus
    q_multimodal_audio_pcm (first checkable after its round-9 oracle
    flip); round 9 also changed the output contract of two
    already-checked names.  The window (VERDICT r08 items 1+4) is
    recomputed here from the committed artifacts so a drifted
    rotation fails loudly:
      * slots 1–3 are the three output-contract flips (the r8
        q_agg_approx_distinct precedent) — every one must now HAVE
        an oracle;
      * every other window name must have NO row in any committed
        artifact r1–r8 (first-time official evidence);
      * every window name must HAVE a DuckDB oracle — rows-only names
        waste slots on ``no_oracle`` records and are excluded;
      * the only oracle-backed never-checked names left OUT are the
        six _R10_DEFERRED (each independently spot-checked green by
        the round-8 judge) — nothing silently dropped."""
    import json
    import pathlib

    import __spark_entry__ as entrymod
    from i3cols_spark.operators import CONTRACT_QUERIES, EXTRA_QUERIES
    from i3cols_spark.operators.registry import (
        _R9_PRIORITY,
        _R9_ROWS_ONLY,
        _R10_DEFERRED,
        POST_R7_ADDITIONS,
        POST_R8_ADDITIONS,
    )

    order = list(entrymod.queries())
    assert len(CONTRACT_QUERIES) == 60
    assert len(_R9_PRIORITY) == 50
    assert len(set(_R9_PRIORITY)) == 50
    assert order[:50] == list(_R9_PRIORITY)
    assert sorted(order) == sorted(QUERIES)

    repo = pathlib.Path(__file__).resolve().parent.parent
    newest: dict[str, int] = {}
    for r in (1, 2, 3, 4, 5, 6, 7, 8):
        art = repo / f"CORRECTNESS_r0{r}.json"
        if art.exists():
            for name in json.loads(art.read_text()):
                newest[name] = r

    window = list(_R9_PRIORITY)
    flips = (
        "q_dedup_near_minhash",
        "q_agg_approx_percentile",
        "q_multimodal_audio_pcm",
    )
    assert tuple(window[:3]) == flips

    already_checked = [n for n in window[3:] if n in newest]
    assert not already_checked, (
        f"window names that already have official rows: {already_checked}"
    )
    stray = [
        n
        for n in window[3:]
        if n not in POST_R7_ADDITIONS and n not in POST_R8_ADDITIONS
    ]
    assert stray == [], stray

    # Slots must not be wasted on rows-only names.
    no_oracle_in_window = [n for n in window if n not in ORACLES]
    assert not no_oracle_in_window, no_oracle_in_window
    assert not set(_R9_ROWS_ONLY) & set(window)
    assert all(n not in ORACLES for n in _R9_ROWS_ONLY)

    # Accounting: every oracle-backed name with no official row is in
    # the window, explicitly deferred, or registered AFTER the window
    # froze (POST_R9_ADDITIONS) — nothing silently dropped.
    from i3cols_spark.operators.registry import POST_R9_ADDITIONS

    never_checked = [
        n for n in QUERIES if n not in newest and n in ORACLES
    ]
    left_out = sorted(set(never_checked) - set(window))
    assert left_out == sorted((*_R10_DEFERRED, *POST_R9_ADDITIONS)), left_out
    assert all(n in ORACLES for n in _R10_DEFERRED)

    # Every contract query now has an oracle entry (the last weak-by-
    # design one, q_dedup_near_minhash, flipped to the audited-bound
    # form in round 9).
    missing = [n for n in CONTRACT_QUERIES if n not in ORACLES]
    assert not missing, f"contract queries without oracle: {missing}"
