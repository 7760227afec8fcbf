"""Round-13 core-scaling probe (VERDICT r12 item 3).

At sf0.1 every local[32]-vs-local[8] wall ratio is ≈ 1 because
per-task fixed cost dominates, so the 100 TB parallelism claims rested
on stage audits alone.  This probe re-asks the question at a 10×
dataset (built by scripts/scale_probe.py's replication machinery):
run the heavy queries at $SPARK_GRAFT_CPUS cores on the scaled data
and print min-of-2 warm noop seconds — one process per core count,
invoked twice by the driver script:

  python scripts/scale_probe.py 10 q_dedup_exact         # build x10 (facts)
  python scripts/scale_probe.py 10 distinct q_dedup_exact  # build d10
  SPARK_GRAFT_CPUS=8  python scripts/core_scaling_probe.py <dataset> <q> ...
  SPARK_GRAFT_CPUS=32 python scripts/core_scaling_probe.py <dataset> <q> ...

``<dataset>`` is a path (e.g. /tmp/i3cols_scale/x10 or .../d10).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    data = sys.argv[1]
    names = sys.argv[2:]
    import i3cols_spark

    print(f"# engine: {os.path.dirname(i3cols_spark.__file__)}", file=sys.stderr)
    from i3cols_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("core-scaling-probe", cpus=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    from i3cols_spark.operators import QUERIES

    # Warm the JVM (bench convention, not measured) — dataset-aware:
    # the d10 build carries only documents/embeddings, no lineitem.
    warm = next(
        f for f in ("lineitem", "documents") if os.path.exists(f"{data}/{f}.parquet")
    )
    spark.read.parquet(f"{data}/{warm}.parquet").limit(10).collect()

    for name in names:
        times = []
        for i in range(3):  # pass 0 = codegen warm, then min-of-2
            df = QUERIES[name](spark, data)
            spark.sparkContext.setJobDescription(f"probe[{cpus}]: {name}")
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
        print(f"{name}\t{cpus}\t{round(min(times[1:]), 3)}")
        sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
