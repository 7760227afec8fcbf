"""Run every query twice in separate sessions (different partition
counts) and compare the Spark-side value hashes — detects queries whose
output depends on execution layout (the driver-gate flakiness class).

Usage: python scripts/stability_check.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from scripts.driver_sim import value_hash  # noqa: E402


def run_pass(sf_dir: str, cpus: int, shuffle_parts: int) -> dict[str, tuple[str, int]]:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"stability-{cpus}-{shuffle_parts}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as mod

    out: dict[str, tuple[str, int]] = {}
    for name, fn in sorted(mod.queries().items()):
        df = fn(spark, sf_dir)
        rows = [tuple(r) for r in df.collect()]
        out[name] = (value_hash(df.columns, rows), len(rows))
    spark.stop()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    a = run_pass(sf_dir, cpus=32, shuffle_parts=7)   # awkward partition counts
    b = run_pass(sf_dir, cpus=5, shuffle_parts=13)   # on purpose
    bad = 0
    for name in a:
        if a[name] != b[name]:
            bad += 1
            print(f"UNSTABLE {name}: {a[name]} vs {b[name]}")
    print(f"STABILITY: {len(a) - bad}/{len(a)} stable across layouts")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
