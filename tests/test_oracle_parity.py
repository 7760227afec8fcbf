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
        # Rows-only check for non-SQL-expressible ops.
        assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue", "n_items"}
