"""§2.3-C (window/sort half) — ranking, per-group top-k, running and
sliding frames, lead/lag, multi-key sort, global top-k.

The reference's analogs: np.argsort (ORDER BY), np.argpartition+slice
(top-k), np.cumsum over ordered events (running frames) — SURVEY §2.2.

Determinism discipline: every window ORDER BY carries a unique
tie-break key (event_id / custkey / orderkey) so row_number and frame
contents are total-ordered and reproducible across engines.  Running
double sums stay unrounded (both engines add in the same total order);
sliding-frame aggregates are rounded because engines may use
segment-tree / subtract-on-evict accumulation that reorders the
additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from i3cols_spark.operators.registry import query
from i3cols_spark.sources.tables import register_views, table


@query(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(row_number() OVER w AS BIGINT) AS rn
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number of customers by acctbal within
    nation.  Spark returns IntegerType for ranks; cast to long to match
    DuckDB BIGINT."""
    cust = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.row_number().over(w).cast("long").alias("rn"),
    )


@query(
    "q_window_topk_pergroup",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_window_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (np.argpartition analog).

    row_number + filter is the scalable pattern: one shuffle on the
    partition key, no global sort; AQE handles skewed customers.
    """
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "q_window_running",
    oracle="""
    SELECT event_id, user_id, ts,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS running_value
    FROM events
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per user over time — the np.cumsum analog.

    Rounded to 6 dp: DuckDB evaluates window sums with segment-tree
    accumulation (different addition tree than Spark's sequential
    frame scan), so even a prefix sum differs in the last ulp.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
    )


@query(
    "q_window_sliding_frame",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 6) AS moving_avg,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ), 6) AS hourly_sum
    FROM events
    """,
)
def q_window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding frames: 3-row moving average + 1-hour RANGE frame.

    Expressed in SQL because RANGE BETWEEN INTERVAL frames have no
    DataFrame-API spelling.  Rounded: sliding accumulators may
    evict/re-add in engine-specific order.
    """
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_id, user_id,
               round(avg(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ), 6) AS moving_avg,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ), 6) AS hourly_sum
        FROM events
        """
    )


@query(
    "q_window_lead_lag",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w  AS gap_us,
           lead(event_id) OVER w                    AS next_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap per user via lag/lead (µs integer arithmetic —
    exact on both sides, no float involved)."""
    ev = table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_n, o_totalprice
    FROM orders
    ORDER BY status_n ASC NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with explicit null placement, made observable
    through a LIMIT (the driver hash is order-insensitive, so the sort
    only shows up via which 100 rows survive).  Null ordering is always
    explicit: Spark defaults NULLS FIRST for ASC, DuckDB NULLS LAST."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.nullif("o_orderstatus", F.lit("O")).alias("status_n"),
            "o_totalprice",
        )
        .orderBy(
            F.col("status_n").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — Spark plans TakeOrderedAndProject: each task
    keeps a 10-row heap, driver merges; no global sort even at 100 TB."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q_window_distribution",
    oracle="""
    SELECT c_custkey, n_name,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0 AS pct_rank,
           floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000.0    AS cume,
           CAST(ntile(4) OVER w AS INT)    AS quartile
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank / cume_dist /
    ntile(4) per nation, the quantile-bucketing primitive for feature
    binning.  Order carries a unique-key tiebreak (c_custkey) so both
    engines rank identically; one shuffle on the partition key.

    6-dp canonicalization is ``floor(x·10⁶ + 0.5)/10⁶`` in BOTH
    dialects instead of ``round``: cume_dist values are exact binary
    fractions (k/n with n a multiple of a power of two), and on the
    exact .5 boundary Spark's round is HALF_UP while DuckDB's double
    round is half-to-even — caught by a sf0.1 soak (k/1280 rows).
    The shared floor construction computes identical doubles on
    identical inputs in either engine.
    """
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy("c_acctbal", "c_custkey")
    half_up6 = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    return (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .select(
            "c_custkey",
            "n_name",
            half_up6(F.percent_rank().over(w)).alias("pct_rank"),
            half_up6(F.cume_dist().over(w)).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
        )
    )


@query(
    "q_window_islands",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), grp AS (
      SELECT user_id, day,
             date_diff('day', DATE '1970-01-01', day)
               - row_number() OVER (PARTITION BY user_id ORDER BY day)
                 AS island_key
      FROM active
    ), islands AS (
      SELECT user_id, min(day) AS start_day, max(day) AS end_day,
             CAST(count(*) AS BIGINT) AS length_days
      FROM grp GROUP BY user_id, island_key
    )
    SELECT user_id, start_day, end_day, length_days
    FROM islands
    ORDER BY length_days DESC, user_id, start_day
    LIMIT 20
    """,
)
def q_window_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    user (top-20 longest streaks) via the classic epoch-day minus
    row_number constant-key trick — the integer-sequence counterpart
    of q_window_sessionid's time-gap sessionization, and the idiom
    behind streak features (retention "current streak", SLA
    continuity, sensor uptime runs).

    Scale shape: one distinct-collapse to (user, day) — active days,
    not events, ride everything downstream — then one per-user
    ordered window (the sessionid shuffle shape) and one
    map-side-combined groupBy of (user, island_key); the top-20 is a
    heap.  All columns are exact integers/dates — no rounding
    anywhere, and the (length, user, start) order is total.
    """
    ev = table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grp = active.select(
        "user_id",
        "day",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("island_key"),
    )
    return (
        grp.groupBy("user_id", "island_key")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count(F.lit(1)).cast("bigint").alias("length_days"),
        )
        .select("user_id", "start_day", "end_day", "length_days")
        .orderBy(F.desc("length_days"), "user_id", "start_day")
        .limit(20)
    )
