"""§2.3-D (scalar half) — string/date/math functions, CASE WHEN enum
decode, and the Python escape hatches (pandas_udf, applyInPandas).

Math-function parity note: sqrt is IEEE-correctly-rounded in both
engines (exact match); transcendentals (cos/ln/exp/pow) come from
different libm implementations (JVM StrictMath-ish vs C) and may
differ in the last ulp, so they are rounded to 9 dp in both dialects.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from i3cols_spark.operators.registry import query
from i3cols_spark.sources.tables import table


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                              AS uname,
           lower(c_mktsegment)                        AS lseg,
           substring(c_name, 1, 8)                    AS head8,
           trim(concat(c_mktsegment, ' ', c_name))    AS cat,
           (c_name LIKE '%42%')                       AS has42,
           regexp_extract(c_name, '([0-9]+)', 1)      AS digits,
           CAST(length(c_name) AS BIGINT)             AS name_len
    FROM customer
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/trim/concat/like/regexp/length."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("head8"),
        F.trim(F.concat("c_mktsegment", F.lit(" "), "c_name")).alias("cat"),
        F.col("c_name").like("%42%").alias("has42"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.length("c_name").cast("long").alias("name_len"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)    AS yr,
           CAST(month(o_orderdate) AS BIGINT)   AS mo,
           CAST(isodow(o_orderdate) AS BIGINT)  AS isodow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
                                                AS days_since,
           o_orderdate + INTERVAL 30 DAY        AS due_date
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/ISO-dow/date_trunc/datediff/interval arithmetic.

    Convention traps handled explicitly (SURVEY §7 hard parts):
    Spark dayofweek is 1=Sunday, DuckDB dayofweek is 0=Sunday → use
    the ISO numbering on both sides (Spark weekday()+1 == DuckDB
    isodow).  All small ints cast to BIGINT.
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("isodow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT event_id,
           abs(value - 100.0)                    AS v_abs,
           CAST(floor(value) AS BIGINT)          AS v_floor,
           CAST(ceil(value) AS BIGINT)           AS v_ceil,
           sqrt(abs(value - 100.0))              AS v_sqrt,
           round(cos(value / 100.0), 9)          AS v_cos,
           round(ln(value + 1.0), 9)             AS v_ln,
           round(exp(-value / 100.0), 9)         AS v_exp,
           round(pow(value, 2), 4)               AS v_pow2
    FROM events
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface — the coszen-style derived quantity analog
    (i3cols/phys.py S13): abs/floor/ceil exact, sqrt IEEE-exact,
    transcendentals rounded (libm divergence)."""
    ev = table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.abs(v - 100.0).alias("v_abs"),
        F.floor(v).cast("long").alias("v_floor"),
        F.ceil(v).cast("long").alias("v_ceil"),
        F.sqrt(F.abs(v - 100.0)).alias("v_sqrt"),
        F.round(F.cos(v / 100.0), 9).alias("v_cos"),
        F.round(F.log(v + 1.0), 9).alias("v_ln"),
        F.round(F.exp(-v / 100.0), 9).alias("v_exp"),
        F.round(F.pow(v, 2), 4).alias("v_pow2"),
    )


#: The enum registry analog (i3cols/enums.py S14): event_type codes.
EVENT_TYPE_CODES = {"click": 1, "purchase": 2, "error": 3, "signup": 4, "view": 5}


@query(
    "q_case_when",
    oracle="""
    SELECT event_id,
           CASE event_type
               WHEN 'click' THEN 1 WHEN 'purchase' THEN 2 WHEN 'error' THEN 3
               WHEN 'signup' THEN 4 WHEN 'view' THEN 5 ELSE 0
           END                                   AS type_code,
           CASE CASE event_type
               WHEN 'click' THEN 1 WHEN 'purchase' THEN 2 WHEN 'error' THEN 3
               WHEN 'signup' THEN 4 WHEN 'view' THEN 5 ELSE 0 END
               WHEN 1 THEN 'click' WHEN 2 THEN 'purchase' WHEN 3 THEN 'error'
               WHEN 4 THEN 'signup' WHEN 5 THEN 'view' ELSE 'unknown'
           END                                   AS type_name
    FROM events
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enum decode round-trip: name → int code → name (the
    i3cols/enums.py mapping as chained CASE WHEN; a broadcast dim
    table is the alternative spelling for large enums)."""
    ev = table(spark, sf_dir, "events")
    code = F.lit(0)
    for name, c in reversed(EVENT_TYPE_CODES.items()):
        code = F.when(F.col("event_type") == name, c).otherwise(code)
    back = F.lit("unknown")
    for name, c in reversed(EVENT_TYPE_CODES.items()):
        back = F.when(code == c, name).otherwise(back)
    return ev.select(
        "event_id", code.cast("int").alias("type_code"), back.alias("type_name")
    )


@query(
    "q_udf_scalar",
    oracle="""
    SELECT event_id, round(cos(value / 100.0), 9) AS coz
    FROM events
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas_udf — the Numba-kernel escape hatch
    (SURVEY §2.1 S13).  Computes the same coszen-style quantity as
    q_math_funcs' native expression, proving UDF/native parity; the
    oracle is the native SQL.  numpy's cos differs from libm in the
    last ulp → same 9 dp rounding."""
    import numpy as np

    @F.pandas_udf("double")
    def coszen(v: pd.Series) -> pd.Series:
        return np.round(np.cos(v / 100.0), 9)

    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", coszen("value").alias("coz"))


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT user_id,
           round(regr_slope(value, (epoch_us(ts) - 1704067200000000) / 3600000000.0), 8)
               AS slope,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id
    HAVING count(*) >= 2
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation in Python: per-user OLS slope of
    value vs time-in-hours (UDAF framework — no reference analog,
    [X] north-star).

    Plan shape: shuffle by the group key, then ONE vectorized pandas
    pass per PARTITION (`mapInPandas` + pandas groupby), not one
    Python call per group — `groupBy().applyInPandas` paid ~2 ms of
    per-group invocation overhead × 1500 groups (3.0 s); this form
    runs the same two-pass OLS in 0.3 s and its per-task cost scales
    with rows, not group count.  Groups are co-located by the
    repartition, and batches are concatenated per partition so a group
    split across Arrow batches is still aggregated whole.

    Numerical discipline: hours are offset from 2024-01-01 in BOTH
    dialects (raw epoch-hours ≈ 4.7e5 would put two-pass vs DuckDB's
    single-pass covariance ulps apart at the 8 dp boundary).
    """

    def slopes(batches):
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        x = (pdf["ts_us"].astype("float64") - 1_704_067_200_000_000) / 3.6e9
        y = pdf["value"].astype("float64")
        uid = pdf["user_id"]
        dx = x - x.groupby(uid).transform("mean")
        dy = y - y.groupby(uid).transform("mean")
        num = (dx * dy).groupby(uid).sum()
        den = (dx * dx).groupby(uid).sum()
        slope = (num / den[den > 0]).round(8)
        out = pd.DataFrame(
            {"user_id": den.index, "slope": slope.reindex(den.index), "n": uid.groupby(uid).size()}
        )
        yield out

    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "value")
        .repartition(spark.sparkContext.defaultParallelism, "user_id")
    )
    out = ev.mapInPandas(slopes, schema="user_id long, slope double, n long")
    return out.filter(F.col("n") >= 2)


@query(
    "q_string_editdist",
    oracle="""
    SELECT a.n_name AS a_name, b.n_name AS b_name,
           CAST(levenshtein(a.n_name, b.n_name) AS INT) AS edit_dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    """,
)
def q_string_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Levenshtein distance over the nation names — the
    string-similarity primitive (fuzzy matching / near-dup keys).
    Both engines implement classic unit-cost edit distance, so values
    match exactly.  The pair space here is a tiny dim self-join; at
    corpus scale edit distance only ever runs AFTER a blocking stage
    (LSH band or fingerprint — see operators/dedup.py) has cut
    candidates to near-linear.
    """
    nat = table(spark, sf_dir, "nation")
    a = nat.select(F.col("n_nationkey").alias("a_key"), F.col("n_name").alias("a_name"))
    b = nat.select(F.col("n_nationkey").alias("b_key"), F.col("n_name").alias("b_name"))
    return (
        a.join(b, F.col("a_key") < F.col("b_key"))
        .select(
            "a_name",
            "b_name",
            F.levenshtein("a_name", "b_name").alias("edit_dist"),
        )
    )


@query(
    "q_udtf_arrow",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text) - length(replace(text, 'e', '')) AS BIGINT)
               AS n_e
    FROM documents
    """,
)
def q_udtf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native batch UDF surface (``mapInArrow``): per-document
    character count and 'e'-occurrence count computed with
    ``pyarrow.compute`` kernels directly on the Arrow buffers — the
    zero-copy tier below Pandas UDFs (no pandas materialization, no
    object boxing), the right shape for string-heavy featurization
    where pandas conversion would dominate.

    The oracle restates both statistics relationally, so the Arrow
    kernel semantics (UTF-8 character vs byte length, substring
    counting) are hash-pinned against the SQL engine's.  Scale: same
    embarrassingly-parallel profile as every mapInPandas operator,
    minus the Arrow→pandas→Arrow double conversion.
    """

    def op(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, "e"), pa.int64()),
                ],
                names=["doc_id", "n_chars", "n_e"],
            )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(op, "doc_id long, n_chars long, n_e long")
