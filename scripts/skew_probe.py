"""Salted-join skew-spread probe (VERDICT r05 item 5 / r06 item 2).

q_join_salted_skew's correctness row only proves result invariance;
this probe measures the one claim the operator exists to make: under a
Zipf hot key, salting flattens the per-task time spread of the join
stage.

Setup: 1M-row fact side with user_id drawn Zipf(s=1.5)-style via the
inverse-CDF approximation k = ceil(u^-2) capped at 10_000 keys — the
hottest key holds ~29% of all rows — joined to a per-key dim table.
AQE and broadcast are disabled inside an isolated session so the join
is a plain shuffled join and reducer partitioning is deterministic:
without the salt, every row of the hot key lands on ONE reducer task;
with the salt, it spreads over n_salts tasks.

Measurement: the join output runs through mapPartitionsWithIndex with
a wall-clock around full iterator consumption — consuming the
iterator PULLS the shuffle read + join work of that partition, so the
elapsed time is the task's join cost.  Empty partitions are dropped
from the median (shuffle hash leaves most of spark.sql.shuffle.
partitions empty at this scale).

Output: one JSON line per variant {variant, rows, tasks, max_s,
median_s, spread} where spread = max/median — the number BASELINE.md
records.  Pass-criterion used in BASELINE.md: salted spread at least
4× smaller than unsalted.

Run: python scripts/skew_probe.py [n_rows] (default 1_000_000).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from i3cols_spark.sources.ingest import salted_join  # noqa: E402

N_KEYS = 10_000
N_SALTS = 8


def timed_partitions(df) -> list[tuple[int, int, float]]:
    """(partition, rows, seconds) for every non-empty output task."""

    def op(idx, it):
        t0 = time.time()
        n = 0
        for _ in it:
            n += 1
        if n:
            yield (idx, n, time.time() - t0)

    return df.rdd.mapPartitionsWithIndex(op).collect()


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("skew-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Zipf-ish fact side: k = ceil(u^-2) capped — hottest key ~29%.
    u = (F.pmod(F.xxhash64("id"), F.lit(1 << 20)) + 1) / float(1 << 20)
    fact = (
        spark.range(0, n_rows, 1, 16)
        .select(
            F.least(F.ceil(F.pow(u, -2.0)), F.lit(N_KEYS))
            .cast("long")
            .alias("user_id"),
            F.col("id").alias("event_id"),
        )
        .localCheckpoint()  # freeze inputs so both variants join identical data
    )
    dim = (
        spark.range(1, N_KEYS + 1)
        .select(
            F.col("id").alias("user_id"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .localCheckpoint()
    )
    hot = fact.groupBy("user_id").count().orderBy(F.desc("count")).limit(1).collect()[0]
    print(
        f"# fact={n_rows} keys={N_KEYS} hottest key={hot['user_id']} "
        f"share={hot['count'] / n_rows:.1%}",
        flush=True,
    )

    variants = {
        "unsalted": lambda: fact.join(dim, "user_id"),
        "salted": lambda: salted_join(fact, dim, "user_id", n_salts=N_SALTS),
    }
    results = {}
    for name, build in variants.items():
        df = build().select("event_id", "payload")
        parts = timed_partitions(df)
        rows = sum(p[1] for p in parts)
        times = sorted(p[2] for p in parts)
        median = times[len(times) // 2]
        spread = times[-1] / max(median, 1e-9)
        results[name] = rows
        print(
            json.dumps(
                {
                    "variant": name,
                    "rows": rows,
                    "tasks": len(parts),
                    "max_s": round(times[-1], 3),
                    "median_s": round(median, 3),
                    "spread": round(spread, 2),
                }
            ),
            flush=True,
        )
    assert results["salted"] == results["unsalted"], results
    print("# row counts match", flush=True)


if __name__ == "__main__":
    main()
