"""The SQL ENTRY PATH on the checked surface: multi-join TPC-H-style
composites submitted as ``spark.sql()`` text over registered temp
views — proving a user can hand this engine the SQL they already run
(every other query on the surface goes through the DataFrame API;
these go through the parser/analyzer, exercising alias resolution,
date literals, subqueries and join reordering end-to-end).

The oracle is the SAME statement in DuckDB's dialect, so the value
hash pins the full parse → optimize → execute path, not a
re-expression.  Catalyst treats SQL and DataFrame plans identically
after analysis — the plan tests assert the composites still get
broadcast dims, partial aggregation and pushed date filters, i.e.
that the text path loses none of the physical quality the DataFrame
path is held to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from i3cols_spark.operators.registry import query
from i3cols_spark.sources.tables import table

#: Pricing-date parameters sit inside the fixture's 1995-2001 span.
_Q3_DATE = "1998-03-15"
_Q5_LO, _Q5_HI = "1996-01-01", "1997-01-01"


def _register(spark: SparkSession, sf_dir: str, names: tuple) -> None:
    for t in names:
        table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "q_sql_tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           floor(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                          AS BIGINT)) / CAST(100 AS DOUBLE) + 0.5) / CAST(100 AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '{_Q3_DATE}'
      AND l.l_shipdate > DATE '{_Q3_DATE}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def q_sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority), adapted to the fixture schema
    (o_orderpriority stands in for the reference's o_shippriority):
    unshipped-revenue top-10 for one market segment — the classic
    3-way fact join with selective filters on BOTH fact sides.
    Submitted as SQL TEXT; per-group revenue rounds at 2 dp (groups
    are order-sized, a handful of terms) and the top-10 orders on the
    rounded value with (date, orderkey) tie-breaks."""
    _register(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(f"""
        SELECT l.l_orderkey,
               floor(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                              AS BIGINT)) / CAST(100 AS DOUBLE) + 0.5) / CAST(100 AS DOUBLE) AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < DATE '{_Q3_DATE}'
          AND l.l_shipdate > DATE '{_Q3_DATE}'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
        LIMIT 10
    """)


@query(
    "q_sql_tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = (SELECT min(r_name) FROM region)
      AND o.o_orderdate >= DATE '{_Q5_LO}'
      AND o.o_orderdate <  DATE '{_Q5_HI}'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q_sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the 6-way snowflake join with
    the LOCAL constraint (customer and supplier share a nation) and a
    scalar subquery picking the region — the join-reordering stress
    test of the suite, submitted as SQL text.  Revenue per nation sums
    thousands of doubles → rounded at 2 dp (float error ~1e-7 at this
    magnitude), ordered on the rounded value with a name tie-break."""
    _register(
        spark, sf_dir,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    )
    return spark.sql(f"""
        SELECT n.n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = (SELECT min(r_name) FROM region)
          AND o.o_orderdate >= DATE '{_Q5_LO}'
          AND o.o_orderdate <  DATE '{_Q5_HI}'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """)


_Q1_SHIP_CUTOFF = "2001-06-01"
_Q10_LO, _Q10_HI = "1996-01-01", "1996-04-01"

_Q1_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '{_Q1_SHIP_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""

_Q10_SQL = f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           -- money discipline: p*(1-d) is an EXACT 4-dp decimal, so a
           -- small group's sum can land exactly on a .xx5 rounding
           -- boundary and engine summation order decides the side
           -- (caught live: 307843.595).  Sum in integer 10^-4 units,
           -- then HALF_UP once -- bit-deterministic in both engines.
           floor(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                          AS BIGINT)) / CAST(100 AS DOUBLE) + 0.5) / CAST(100 AS DOUBLE) AS revenue,
           round(c.c_acctbal, 2) AS acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '{_Q10_LO}'
      AND o.o_orderdate <  DATE '{_Q10_HI}'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


@query("q_sql_tpch_q1", oracle=_Q1_SQL)
def q_sql_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) as SQL text — the scan-heavy
    single-table aggregate of the suite (nine aggregates over ~all of
    lineitem, the whole-stage-codegen showcase): one pushed date
    filter, one map-side-combined groupBy of 6 cells.  The ONE
    statement runs verbatim in both engines (identical dialect
    subset), so the oracle string IS the Spark string."""
    _register(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q1_SQL)


@query("q_sql_tpch_q10", oracle=_Q10_SQL)
def q_sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting) as SQL text: the 4-way
    join + wide GROUP BY (customer attributes ride the key) + top-20,
    with selective filters on both fact sides — the classic
    "who should we call about returns this quarter" report.  One
    statement, both dialects, rounded revenue ordering with a custkey
    tie-break."""
    _register(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return spark.sql(_Q10_SQL)


_WINDOW_SQL = """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey), 2)
                 AS cust_total
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rn, cust_total
    FROM ranked WHERE rn <= 2 AND cust_total > 900000
    ORDER BY cust_total DESC, o_custkey, rn
"""


@query("q_sql_window_topk", oracle=_WINDOW_SQL)
def q_sql_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-SQL text path: top-2 orders per high-value customer
    via ``row_number`` + a windowed customer total, filtered on the
    window result (the QUALIFY pattern spelled as a CTE) — the window-
    function half of the SQL surface q_sql_tpch_* (joins/aggregates)
    doesn't touch, run as ONE statement in both engines.

    Determinism notes: the per-customer total sums 2-dp money values,
    which always lands ≥ 0.005 from a 2-dp rounding boundary (sums of
    2-dp decimals ARE 2-dp decimals) — unlike Q10's 4-dp products, so
    plain round() is safe here; row_number ties break on o_orderkey.
    """
    _register(spark, sf_dir, ("orders",))
    return spark.sql(_WINDOW_SQL)
