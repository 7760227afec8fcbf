"""§2.3-A — scans, projection, filters.

The i3cols analog surface: ``cols.load(keys=...)`` is projection
(column pruning by storage layout), boolean-mask fancy-indexing is
filtering (SURVEY §2.1 S5/S6, §2.2).  Here both are declarative and
Catalyst pushes them into the Parquet scan: `.explain()` shows
``PushedFilters`` and a pruned ``ReadSchema`` — the 100 TB behavior
(row-group skipping, partition pruning) falls out of the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from i3cols_spark.operators.registry import query
from i3cols_spark.sources.tables import table


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection → Parquet column pruning (i3cols ``load(keys=...)``)."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@query(
    "q_filter_simple",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def q_filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single predicate → pushed to the scan (i3cols boolean mask)."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
    FROM lineitem
    WHERE (l_quantity BETWEEN 10 AND 20 OR NOT (l_returnflag IN ('A', 'N')))
      AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
      AND l_discount > 0.05
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + IN-list + BETWEEN on dates (compound NumPy mask analog)."""
    li = table(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_quantity").between(10, 20) | ~F.col("l_returnflag").isin("A", "N"))
        & F.col("l_shipdate").between("1995-01-01", "1996-12-31")
        & (F.col("l_discount") > 0.05)
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"
    )


@query(
    "q_filter_null_semantics",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (NULLIF(l_returnflag, 'N') IS NULL) AS flag_is_null,
           (NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULLIF(l_linestatus, 'O'))
               AS nullsafe_eq
    FROM lineitem
    WHERE NULLIF(l_returnflag, 'N') IS NULL OR NULLIF(l_linestatus, 'O') IS NOT NULL
    """,
)
def q_filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / null-safe equality (``<=>``).

    The fixture tables carry no NULLs, so NULLIF injects them
    deterministically; the point is three-valued-logic parity.
    """
    li = table(spark, sf_dir, "lineitem")
    flag = F.nullif(F.col("l_returnflag"), F.lit("N"))
    status = F.nullif(F.col("l_linestatus"), F.lit("O"))
    return (
        li.filter(flag.isNull() | status.isNotNull())
        .select(
            "l_orderkey",
            "l_linenumber",
            flag.isNull().alias("flag_is_null"),
            flag.eqNullSafe(status).alias("nullsafe_eq"),
        )
    )


@query(
    "q_project_computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year
    FROM lineitem
    """,
)
def q_project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived columns (i3cols S13 vectorized kernels → expression DSL).

    Per-row IEEE double arithmetic is deterministic and bit-identical
    across engines, so no rounding is needed (unlike reductions).
    """
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        F.year("l_shipdate").cast("long").alias("ship_year"),
    )


def _npy_events_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events table once per dataset CONTENT in the
    reference's native npy column-dir layout (under the system temp
    dir), so the scan below exercises the real migration path: npy
    dataset → Python DataSource → DataFrame.

    The ``_SUCCESS`` marker records a size+mtime fingerprint of the
    source parquet: an in-place fixture regeneration (it happened
    between rounds 2 and 3) invalidates the cached mirror instead of
    silently serving stale rows — same hygiene as the IVF index
    (operators/similarity.py::build_ivf_index)."""
    import hashlib
    import os
    import tempfile

    from i3cols_spark.operators.similarity import _data_fingerprint
    from i3cols_spark.sources.npy_cols import write_npy_columns

    fp = _data_fingerprint(os.path.join(sf_dir, "events.parquet"))
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"i3cols_npy_events_{tag}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == fp:
                return out
    write_npy_columns(
        table(spark, sf_dir, "events").select("event_type", "value"),
        out,
        overwrite=True,
    )
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(fp)
    os.replace(tmp, marker)
    return out


@query(
    "q_source_npy_scan",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def q_source_npy_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S5 ingest parity end-to-end: aggregate events read through
    the ``i3cols_npy`` Python DataSource (sources/npy_cols.py — the
    reference's ``<key>/data.npy`` column-dir format, i3cols/cols.py::
    load), not through parquet.  Row-range splits mmap their slice of
    every key and yield Arrow batches; the oracle runs the same
    aggregate over the parquet twin, proving value-level fidelity of
    the format bridge."""
    from i3cols_spark.sources.npy_cols import read_npy_columns

    fixture = _npy_events_fixture(spark, sf_dir)
    df = read_npy_columns(spark, fixture, keys=["event_type", "value"])
    return df.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
