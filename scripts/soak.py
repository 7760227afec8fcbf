"""Robustness soak — the checks beyond the driver gate that have
caught real bugs:

  * alternate scale factors (sf0.001 / sf0.1): the sf0.1 soak caught
    the dyadic-rational rounding divergence (functions/rounding.py);
  * alternate parallelism (local[3], 7 shuffle partitions): flushes
    partition-count-dependent results (unsorted collect_list,
    non-deterministic first());
  * double-run determinism: every query executed twice in one
    session, canonical row sets compared.

Usage:
    python scripts/soak.py partitions [sf_dir]   # odd-shaped session, full oracle compare
    python scripts/soak.py determinism [sf_dir]  # run-twice row-set equality
    (alternate-SF soak = scripts/driver_sim.py with another sf dir)

Exit 0 = clean.  Each mode prints one SUMMARY line.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def soak_partitions(sf_dir: str) -> int:
    from pyspark.sql import SparkSession

    from i3cols_spark.compare import run_all

    spark = (
        SparkSession.builder.master("local[3]")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = run_all(spark, sf_dir)
    bad = {
        k: v
        for k, v in res.items()
        if not (v == "ok" or (isinstance(v, str) and v.startswith("rows-only")))
    }
    print(f"SUMMARY partitions: {len(res)} queries, bad={bad or 'none'}")
    return 1 if bad else 0


def soak_determinism(sf_dir: str) -> int:
    from i3cols_spark.compare import _canon_rows
    from i3cols_spark.operators import QUERIES
    from i3cols_spark.session import get_spark

    spark = get_spark("soak")
    bad = []
    for name, fn in QUERIES.items():
        try:
            def snap():
                df = fn(spark, sf_dir)
                return _canon_rows(df.columns, [tuple(r) for r in df.collect()])

            if snap() != snap():
                bad.append(name)
        except Exception as e:  # noqa: BLE001 - report and continue
            bad.append(f"{name}: {str(e)[:80]}")
    print(f"SUMMARY determinism: {len(QUERIES)} queries, bad={bad or 'none'}")
    return 1 if bad else 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "partitions"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    raise SystemExit({"partitions": soak_partitions, "determinism": soak_determinism}[mode](sf))
