"""SparkSession construction and defensive runtime configuration.

The driver (and any embedding application) may hand us a session we did
not build, so everything the engine *requires* must be settable at
runtime: ``configure(spark)`` is idempotent and safe to call on a
foreign session at the top of every query entry point.

Reference parity: i3cols has no session concept (eager NumPy,
single process — SURVEY §3.1); this module is where its implicit
"environment" (UTC times, mmap laziness, pool parallelism) becomes
explicit Spark config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs every engine entry point needs.  Keys chosen per
# SURVEY §4.3 ("config knobs — only ones that matter").
_RUNTIME_CONFS: dict[str, str] = {
    # Deterministic time semantics on both sides of the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # The events table carries parquet TIMESTAMP(NANOS); Spark's
    # TimestampType is µs-precision, so read nanos as LongType and let
    # sources.tables derive a µs timestamp + ns shadow column
    # (SURVEY §4.3 ns-precision rule).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # AQE: runtime shuffle-partition coalescing + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Arrow transfer for the pandas_udf / applyInPandas escape hatches.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply required runtime confs; idempotent, foreign-session-safe."""
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A locked-down session may refuse some keys; queries that
            # truly need one will fail loudly on their own.
            pass
    try:
        # Only touch shuffle.partitions when it's still Spark's stock 200
        # (a deliberate user setting is respected): 200 tiny shuffle
        # partitions on a local session is pure scheduling overhead, and
        # AQE coalescing can't fix the task-launch cost.
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            cores = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 8)))
    except Exception:
        pass
    # NOT set here: spark.sql.adaptive.coalescePartitions.
    # initialPartitionNum.  Starting every shuffle wide looks like the
    # scale-safe default, but the round-7 A/B measured it at +60% on
    # the d10 ngram posting-list join (16.3 s vs 10.2 s min-of-2) and
    # it still did not save the d100 run from heap exhaustion — the
    # O(Σ|posting|²) intermediate there (~10^10 rows) simply exceeds
    # one 8 GiB JVM whatever the reducer count.  On a real cluster the
    # user sizes shuffle.partitions to total cores and the same plans
    # distribute; locally the density ceiling is documented on the
    # exact-Jaccard family (operators/dedup.py) with the LSH route as
    # the high-density escape.
    return spark


def get_spark(
    app_name: str = "i3cols-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local session sized for this host.

    On a real cluster the user brings their own session (spark-submit
    config); this builder exists for tests, bench.py and the CLI.
    ``shuffle.partitions`` is sized to cores, not Spark's default 200 —
    at local scale 200 tiny shuffle partitions is pure scheduling
    overhead, while on a 1000-executor cluster the same code path would
    set it to ~2-3× total cores (AQE coalesces the excess).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Managed-table home for bucketed datasets (sources.ingest.write_bucketed).
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/i3cols_spark_warehouse"),
        )
    )
    for key, value in _RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
