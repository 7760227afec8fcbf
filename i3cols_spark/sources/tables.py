"""Columnar table loading — the i3cols ``cols.load`` analog.

i3cols loads a directory of per-key ``.npy`` columns into a dict of
NumPy arrays with optional mmap laziness and key-subset projection
(reference: i3cols/cols.py::load, ::load_item, ::find_array_paths —
SURVEY §2.1 S5/S6).  Here the store is Parquet and the lazy handle is a
DataFrame: column pruning and predicate pushdown replace
``load(keys=...)`` + mmap, and Catalyst applies both automatically from
the query itself, so ``table()`` takes no ``keys`` argument — callers
just ``.select()``.

Scale note (100 TB): this reader is a thin wrapper over the Parquet
datasource, so partition pruning (`partitionBy` layout written by
sources.ingest), row-group skipping via min/max stats, and
``spark.sql.files.maxPartitionBytes`` splitting all apply unchanged on
a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from i3cols_spark.session import configure

#: The driver-supplied star schema + extension fixtures (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Post-normalization contract schema per fixture table: column name →
#: allowed Spark dtype strings.  Most columns pin ONE dtype; columns
#: with several field-tested parquet flavors (the round-3 NTZ class:
#: date columns arrive tz-less or tz-aware depending on the fixture
#: generator) list every flavor the operators are verified against.
#: ``table()`` checks this on every load — metadata-only, no scan —
#: so a regenerated fixture that drifts a logical type fails LOUDLY
#: at the choke point, naming the column, instead of surfacing as a
#: cryptic mid-query error or a silent value change (VERDICT r04
#: item 6; round 3's breakage class).
_DATE_FLAVORS = ("timestamp_ntz", "timestamp")
FIXTURE_SCHEMAS: dict[str, dict[str, tuple[str, ...]]] = {
    "region": {"r_regionkey": ("int",), "r_name": ("string",)},
    "nation": {
        "n_nationkey": ("int",), "n_name": ("string",),
        "n_regionkey": ("int",),
    },
    "customer": {
        "c_custkey": ("bigint",), "c_name": ("string",),
        "c_nationkey": ("int",), "c_acctbal": ("double",),
        "c_mktsegment": ("string",),
    },
    "supplier": {
        "s_suppkey": ("bigint",), "s_name": ("string",),
        "s_nationkey": ("int",), "s_acctbal": ("double",),
    },
    "part": {
        "p_partkey": ("bigint",), "p_name": ("string",),
        "p_brand": ("string",), "p_type": ("string",),
        "p_size": ("int",), "p_retailprice": ("double",),
    },
    "orders": {
        "o_orderkey": ("bigint",), "o_custkey": ("bigint",),
        "o_orderstatus": ("string",), "o_totalprice": ("double",),
        "o_orderdate": _DATE_FLAVORS, "o_orderpriority": ("string",),
    },
    "lineitem": {
        "l_orderkey": ("bigint",), "l_partkey": ("bigint",),
        "l_suppkey": ("bigint",), "l_linenumber": ("int",),
        "l_quantity": ("double",), "l_extendedprice": ("double",),
        "l_discount": ("double",), "l_tax": ("double",),
        "l_returnflag": ("string",), "l_linestatus": ("string",),
        "l_shipdate": _DATE_FLAVORS,
    },
    # events is checked AFTER normalize_events_ts, so ts is always the
    # contract TimestampType and ts_ns the nanosecond shadow.
    "events": {
        "event_id": ("bigint",), "ts": ("timestamp",),
        "user_id": ("bigint",), "event_type": ("string",),
        "value": ("double",), "props": ("string",),
        "ts_ns": ("bigint",),
    },
    "documents": {
        "doc_id": ("bigint",), "text": ("string",), "lang": ("string",),
        "source": ("string",), "n_chars": ("bigint",),
    },
    "embeddings": {
        "vec_id": ("bigint",), "embedding": ("array<float>",),
        "label": ("int",),
    },
}


class SchemaDriftError(RuntimeError):
    """A fixture table's parquet schema no longer matches the engine
    contract — raised at ``table()`` load, naming every drift."""


def check_fixture_schema(name: str, df: DataFrame) -> None:
    """Compare ``df``'s dtypes to ``FIXTURE_SCHEMAS[name]``; raise
    :class:`SchemaDriftError` listing every missing / unexpected /
    retyped column.  Metadata-only (``df.dtypes`` comes from the
    parquet footer already read at plan time)."""
    expected = FIXTURE_SCHEMAS.get(name)
    if expected is None:
        return
    actual = dict(df.dtypes)
    drifts = []
    for col, allowed in expected.items():
        if col not in actual:
            drifts.append(f"missing column {col!r} (expected {'/'.join(allowed)})")
        elif actual[col] not in allowed:
            drifts.append(
                f"column {col!r} is {actual[col]!r}, expected {'/'.join(allowed)}"
            )
    for col in actual:
        if col not in expected:
            drifts.append(f"unexpected column {col!r} ({actual[col]!r})")
    if drifts:
        raise SchemaDriftError(
            f"fixture table {name!r} drifted from the engine contract "
            f"(regenerated testdata? update sources/tables.py:FIXTURE_SCHEMAS "
            f"and re-verify the operators): " + "; ".join(drifts)
        )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from ``{sf_dir}/{name}.parquet`` (lazy).

    ``events.ts`` arrives in either of two parquet flavors depending on
    the fixture generator, and ``table()`` normalizes both to the same
    contract — ``ts`` is session-zoned TimestampType (µs) and ``ts_ns``
    is the full-precision epoch-nanos LongType shadow (the I3TIME_T
    "DAQ tick" analog — SURVEY §1.2 / §4.3):

    * TIMESTAMP(NANOS): Spark reads it as LongType epoch-nanos
      (session.py sets ``nanosAsLong``); ``ts`` is derived via integer
      ``div 1000`` — the exact truncation DuckDB applies casting
      TIMESTAMP_NS → TIMESTAMP, so the oracle sees identical values.
    * timestamp[us] with no timezone: Spark 4 reads TIMESTAMP_NTZ,
      which ``unix_micros``/``window()`` reject.  The session timezone
      is pinned UTC on both engines (session.py / compare harness), so
      ``cast("timestamp")`` is value-identical and ``ts_ns`` is the
      µs ticks ×1000.
    """
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    check_fixture_schema(name, df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize an events frame's ``ts`` to the engine contract —
    works on batch AND streaming DataFrames (dtype inspection only, no
    actions).  Unrecognized ``ts`` types pass through unchanged."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
            "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
        )
    elif ts_type == "timestamp":
        # tz-aware µs parquet (the third flavor a generator could emit)
        # — ts is already the contract type; only the ns shadow column
        # needs deriving.
        df = df.withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
    else:
        return df
    # Keep the driver's column order with ts in place.
    return df.select("event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns")


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load several tables → dict (the ``cols.load`` dict-of-arrays analog)."""
    return {name: table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so operators can use ``spark.sql`` freely."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def spread(df: DataFrame, spark: SparkSession, min_bytes: int = 256 << 10) -> DataFrame:
    """Round-robin a NARROW single-split input across cores — but only
    when the shuffle can pay for itself.

    The documents/embeddings fixtures arrive as one parquet file ⇒ one
    input split, so per-row CPU work (shingling, hashing, GEMM prep)
    would otherwise run on one core; at production scale the file
    count provides the parallelism and this becomes a no-op.  Skipped
    when the input is already split at least ``defaultParallelism``
    ways or is too small (< ``min_bytes``) for task-spreading to beat
    the fixed cost of a 32-task shuffle — at oracle SF (sf0.01) the
    unconditional form was pure per-query overhead (VERDICT r01).
    """
    import os
    from urllib.parse import unquote

    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
        # inputFiles() returns URIs: strip the scheme AND percent-decode
        # — a path with spaces/unicode arrives URL-encoded and a raw
        # getsize() on it silently reports the file missing (ADVICE r03).
        paths = [unquote(f.removeprefix("file:")) for f in files]
        nbytes = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    except Exception:  # non-file-backed plan — keep the old behavior
        return df.repartition(target)
    if len(files) >= target or nbytes < min_bytes:
        return df
    return df.repartition(target)
