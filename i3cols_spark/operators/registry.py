"""Query registry — the binding between SURVEY §2.3's declared
inventory, ``__spark_entry__.queries()`` and ``oracle_sql()``.

Each operator module registers its queries with the ``@query``
decorator.  A query is a callable ``(spark, sf_dir) -> DataFrame``; the
optional ``oracle`` is the ANSI-SQL equivalent DuckDB runs on the same
parquet (tables pre-registered as views).  Omitting ``oracle`` marks
the query as non-SQL-expressible → the driver records a weaker
rows-only check (SURVEY §5.2).

Discipline (SURVEY §5.2.4): every computed column aliased identically
in both dialects; explicit casts where engines' type widening differs
(DuckDB sum(int)→HUGEINT, year()→BIGINT, ...); multi-row float
reductions rounded to a declared precision in BOTH dialects because
their summation order is nondeterministic; per-row IEEE arithmetic is
left unrounded (bit-identical across engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
