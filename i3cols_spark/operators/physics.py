"""Reference-surface completions: histogram/binning (np.histogram /
np.bincount — SURVEY §2.2), ragged per-event summaries (i3cols/phys.py
S13 pulse-series kernels), enum decode via broadcast dim join
(i3cols/enums.py S14), and pivot (reshape, [X]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from i3cols_spark.operators.registry import query
from i3cols_spark.sources.tables import table


@query(
    "q_agg_histogram",
    oracle="""
    SELECT CASE WHEN value < 0.0 THEN 0
                WHEN value >= 200.0 THEN 21
                ELSE CAST(floor(value / 10.0) AS BIGINT) + 1 END AS bucket,
           CAST(count(*) AS BIGINT)            AS n,
           round(sum(value), 2)                AS bucket_sum
    FROM events
    GROUP BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """np.histogram analog: 20 equi-width buckets over [0, 200).

    Spark's width_bucket(v, 0, 200, 20) evaluates floor(v/10)+1 with
    bucket 0 below range and 21 above; DuckDB lacks width_bucket, so
    the oracle states that arithmetic explicitly (identical doubles:
    (200-0)/20 is exactly 10.0).  At any scale this is one
    partial+final aggregation — the map-side combine reduces each
    partition to ≤22 rows before the shuffle.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", F.width_bucket("value", F.lit(0.0), F.lit(200.0), F.lit(20)))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("bucket_sum"),
        )
    )


@query(
    "q_physics_pulse_summary",
    oracle="""
    SELECT l_orderkey AS event_id,
           CAST(count(*) AS BIGINT)        AS n_pulses,
           round(sum(l_extendedprice), 2)  AS total_charge,
           min(l_shipdate)                 AS first_time,
           max(l_shipdate)                 AS last_time,
           max(l_quantity)                 AS max_width
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def q_physics_pulse_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event pulse-series summary — the i3cols/phys.py kernel
    family (total charge, first/last hit time, hit count) over the
    ragged column.

    Deliberately computed the i3cols way: rebuild the ragged pulses
    array per event (collect_list), then reduce it with array HOFs —
    while the oracle states the same semantics as a flat GROUP BY.
    The differential check proves ragged-kernel ≡ relational-agg, the
    core equivalence of SURVEY §1.2.  (At 100 TB you'd keep the flat
    aggregation; the HOF form is for data already stored ragged.)
    """
    li = table(spark, sf_dir, "lineitem")
    pulses = li.groupBy(F.col("l_orderkey").alias("event_id")).agg(
        F.collect_list(
            F.struct(
                F.col("l_shipdate").alias("time"),
                F.col("l_extendedprice").alias("charge"),
                F.col("l_quantity").alias("width"),
            )
        ).alias("pulses")
    )
    charge_sum = F.aggregate(
        F.col("pulses"), F.lit(0.0), lambda acc, p: acc + p.charge
    )
    return pulses.select(
        "event_id",
        F.size("pulses").cast("long").alias("n_pulses"),
        F.round(charge_sum, 2).alias("total_charge"),
        F.array_min(F.transform("pulses", lambda p: p.time)).alias("first_time"),
        F.array_max(F.transform("pulses", lambda p: p.time)).alias("last_time"),
        F.array_max(F.transform("pulses", lambda p: p.width)).alias("max_width"),
    )


@query(
    "q_enum_decode_join",
    oracle="""
    SELECT e.event_id, e.event_type, c.code AS type_code
    FROM events e
    JOIN (VALUES ('click', 1), ('purchase', 2), ('error', 3),
                 ('signup', 4), ('view', 5)) AS c(name, code)
      ON e.event_type = c.name
    """,
)
def q_enum_decode_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enum decode via broadcast dimension join — the scalable S14
    spelling (vs q_case_when's chained CASE): a 5-row dim broadcast to
    every executor, no shuffle of the fact side."""
    from i3cols_spark.operators.scalar_funcs import EVENT_TYPE_CODES
    from i3cols_spark.sources.schemas import enum_dim

    ev = table(spark, sf_dir, "events")
    dim = enum_dim(
        spark,
        {v: k for k, v in EVENT_TYPE_CODES.items()},
        code_col="type_code",
        name_col="name",
    )
    return ev.join(F.broadcast(dim), ev.event_type == dim.name, "inner").select(
        "event_id", "event_type", "type_code"
    )


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 0), 2) AS status_O,
           round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END), 0), 2) AS status_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (reshape).  Explicit value list —
    an unlisted pivot would need an extra distinct-scan pass, which at
    100 TB is a full extra job; always enumerate pivot values."""
    li = table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)), 2))
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("status_O"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("status_F"),
    )


@query(
    "q_agg_log_histogram",
    oracle="""
    WITH b AS (
        SELECT CAST(length(bin(CAST(floor(o_totalprice) AS BIGINT))) - 1
                    AS BIGINT) AS bucket,
               o_totalprice AS v
        FROM orders WHERE o_totalprice >= 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b)
    SELECT bucket,
           pow(2, bucket) AS lo,
           pow(2, bucket + 1) AS hi,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(min(v), 2) AS min_val,
           round(max(v), 2) AS max_val,
           floor(CAST(count(*) AS DOUBLE) / tot.n * 1000000 + 0.5)
               / 1000000.0 AS frac
    FROM b, tot
    GROUP BY bucket, tot.n
    ORDER BY bucket
    """,
)
def q_agg_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-bucketed histogram of order totals — the LONG-TAIL
    companion of the equi-width q_agg_histogram: bucket =
    ⌊log₂(v)⌋, so each bucket doubles its span and a distribution
    spanning five orders of magnitude (latencies, payload sizes,
    money) reads in ~17 rows where equi-width needs thousands or
    saturates one bin.  This is the HdrHistogram/DDSketch bucketing
    idea as a plain aggregate — and because the bucket function is a
    PURE per-row expression, log-histograms of 100 TB are one
    map-side-combined groupBy with |buckets| ≈ 64 reduce rows.

    Cross-engine exactness: ⌊log₂ v⌋ via libm diverges by 1 ulp
    exactly at integer powers of two (1024.00 is a real price), so
    the bucket is computed as PURE INTEGER/STRING arithmetic instead:
    bit_length(⌊v⌋) − 1 == ⌊log₂ v⌋ for every v ≥ 1 (⌊v⌋ and v never
    straddle a power of two — powers of two are integers), using the
    registry-documented portable ``bin()`` no-leading-zeros identity
    (the oracle-checked-HLL trick).  Counts are exact integers, the
    fraction is an exact-integer ratio → HALF_UP 6 dp; 2^bucket is
    exact in double for every bucket ≤ 52.
    """
    from i3cols_spark.functions.rounding import round_half_up

    b = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            (
                F.length(F.bin(F.floor("o_totalprice").cast("long"))) - 1
            ).cast("long").alias("bucket"),
            F.col("o_totalprice").alias("v"),
        )
    )
    tot = b.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        b.crossJoin(F.broadcast(tot))
        .groupBy("bucket", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.min("v"), 2).alias("min_val"),
            F.round(F.max("v"), 2).alias("max_val"),
        )
        .select(
            "bucket",
            F.pow(F.lit(2.0), F.col("bucket")).alias("lo"),
            F.pow(F.lit(2.0), F.col("bucket") + 1).alias("hi"),
            "n_rows",
            "min_val",
            "max_val",
            round_half_up(
                F.col("n_rows").cast("double") / F.col("n"), 6
            ).alias("frac"),
        )
        .orderBy("bucket")
    )
