"""§2.3-C (set ops + subqueries) — UNION ALL/DISTINCT, INTERSECT,
EXCEPT ALL, IN/scalar/correlated-EXISTS subqueries.

Reference analogs: np.concatenate (UNION ALL), np.unique (DISTINCT),
np.intersect1d / np.setdiff1d (INTERSECT / EXCEPT) — SURVEY §2.2.
Subqueries have no reference analog ([X] north-star); Catalyst
decorrelates EXISTS/IN into semi-joins, which is exactly the plan a
100 TB run needs (no per-row subquery execution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from i3cols_spark.operators.registry import query
from i3cols_spark.sources.tables import register_views, table


@query(
    "q_union_all",
    oracle="""
    SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE value > 150
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two overlapping event slices (np.concatenate /
    i3cols combine_runs S7 analog — duplicates preserved)."""
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.filter(F.col("event_type") == "click").unionByName(
        ev.filter(F.col("value") > 150)
    )


@query(
    "q_union_distinct",
    oracle="""
    SELECT user_id, event_type FROM events WHERE value > 100
    UNION
    SELECT user_id, event_type FROM events WHERE event_type = 'click'
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — np.unique(np.concatenate(...)) analog."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value") > 100)
        .select("user_id", "event_type")
        .unionByName(
            ev.filter(F.col("event_type") == "click").select("user_id", "event_type")
        )
        .distinct()
    )


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate <  TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in both periods (np.intersect1d analog)."""
    orders = table(spark, sf_dir, "orders")
    before = orders.filter(F.col("o_orderdate") < "1997-01-01").select("o_custkey")
    after = orders.filter(F.col("o_orderdate") >= "1997-01-01").select("o_custkey")
    return before.intersect(after)


@query(
    "q_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate <  TIMESTAMP '1997-01-01'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (np.setdiff1d with counts)."""
    orders = table(spark, sf_dir, "orders")
    before = orders.filter(F.col("o_orderdate") < "1997-01-01").select("o_custkey")
    after = orders.filter(F.col("o_orderdate") >= "1997-01-01").select("o_custkey")
    return before.exceptAll(after)


@query(
    "q_subquery_in",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → Catalyst rewrites to left-semi join."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        """
    )


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (global average as a filter threshold)."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        """
    )


@query(
    "q_exists_correlated",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated by Catalyst into a semi-join
    (no per-row re-execution; scales as one shuffle)."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        """
    )
