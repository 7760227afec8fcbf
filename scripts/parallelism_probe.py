"""Parallelism probe (round 11): flag serialization-bound plans.

The q_join_interval_pairs finding showed a plan can be hash-green at
every SF yet run its expensive stage as ONE task (AQE coalesced a
small slice to one partition ahead of an explosive join) — invisible
to correctness gates AND to single-setting wall-clock benches, but
fatal on a 1000-executor cluster.

This probe runs each query at two local parallelism levels (default
local[32] vs local[4], same shuffle-partition count so the task GRID
is identical and only concurrency changes) and reports the speedup.
A query whose wall is flat across an 8× core ratio is bottlenecked on
one (or a few) tasks; a well-parallelized plan shows a clear speedup
once wall is large enough to dominate fixed overhead (~JVM/planning
≈0.2-0.5 s, which is why sub-second queries are reported but not
judged).

Usage:
    python scripts/parallelism_probe.py               # bench HEADLINE
    python scripts/parallelism_probe.py q_a q_b ...   # subset

Each level runs in its OWN process/JVM (sequentially, min-of-2 warm,
noop sink) and writes a json line; the parent merges and prints the
ratio table, slowest-at-32 first.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHUFFLE = 32  # identical task grid at both levels


def run_level(cpus: int, names: list[str]) -> dict[str, float]:
    out = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--level",
            str(cpus),
            *names,
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"level local[{cpus}] failed (rc={out.returncode}):\n{out.stderr}"
        )
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def level_main(cpus: int, names: list[str]) -> None:
    sys.path.insert(0, REPO)
    from i3cols_spark.operators import QUERIES
    from i3cols_spark.session import get_spark

    spark = get_spark(f"par-probe-{cpus}", cpus=cpus, shuffle_partitions=SHUFFLE)
    spark.sparkContext.setLogLevel("ERROR")

    def once(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name in names:
        once(name)  # warm (codegen JIT, Python worker spawn)
        timings[name] = min(once(name), once(name))
    print(json.dumps(timings))


def main() -> None:
    if "--level" in sys.argv:
        i = sys.argv.index("--level")
        level_main(int(sys.argv[i + 1]), sys.argv[i + 2 :])
        return

    names = sys.argv[1:]
    if not names:
        sys.path.insert(0, REPO)
        import bench

        names = list(bench.HEADLINE)
    hi = run_level(32, names)
    lo = run_level(4, names)
    print(f"{'query':36s} {'local[32]':>9s} {'local[4]':>9s} {'speedup':>8s}")
    flagged = []
    for n in sorted(names, key=lambda n: -hi[n]):
        sp = lo[n] / hi[n] if hi[n] else float("inf")
        mark = ""
        # judge only queries big enough to dominate fixed overhead
        if hi[n] >= 1.0 and sp < 1.6:
            mark = "  <-- serialization-bound?"
            flagged.append(n)
        print(f"{n:36s} {hi[n]:9.2f} {lo[n]:9.2f} {sp:8.1f}{mark}")
    print(f"FLAGGED={flagged}")


if __name__ == "__main__":
    main()
