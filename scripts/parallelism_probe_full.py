"""Full-surface parallelism probe (round 12, VERDICT r11 item 5).

The round-11 probe only covered the 48-query bench HEADLINE, and the
q_join_interval_pairs single-task bug had lived for two rounds in a
registered, hash-green query OUTSIDE that subset.  This wrapper sweeps
the ENTIRE registered surface (324 names, ``surface_order()``) through
the same two-level comparison the headline probe uses — local[32] vs
local[4] with an identical 32-partition task grid — so a
serialization-bound plan cannot hide in the un-benched tail.

Differences from scripts/parallelism_probe.py (the headline probe):

* **Chunked + resumable.**  Names run in chunks of ``CHUNK`` per JVM
  pair; each finished chunk appends rows to ``OUT`` (jsonl), and a
  restart skips names already recorded.  A 324-name sweep survives a
  crash/timeout without losing hours of work.
* **warm + 1 measured run** per level (the headline probe uses
  min-of-2).  The full sweep is a coarse classifier — anything it
  flags gets re-probed precisely with the headline probe before being
  judged, so single-run noise only costs a re-check, never a verdict.

Usage:
    python scripts/parallelism_probe_full.py            # full surface
    python scripts/parallelism_probe_full.py --report   # classify OUT
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "scripts", "probe_full_r12.jsonl")
SHUFFLE = 32  # identical task grid at both levels
CHUNK = 24


def level_main(cpus: int, names: list[str]) -> None:
    sys.path.insert(0, REPO)
    from i3cols_spark.operators import QUERIES
    from i3cols_spark.session import get_spark

    spark = get_spark(f"par-probe-full-{cpus}", cpus=cpus, shuffle_partitions=SHUFFLE)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in names:
        def once() -> float:
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        try:
            once()  # warm (codegen JIT, Python worker spawn)
            timings[name] = once()
        except Exception as exc:  # record, keep sweeping
            timings[name] = -1.0
            print(f"ERROR {name}: {exc!r}", file=sys.stderr)
    print("PROBE_JSON:" + json.dumps(timings))


def run_level(cpus: int, names: list[str]) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--level", str(cpus), *names],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=5400,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"level local[{cpus}] failed (rc={out.returncode}):\n{out.stderr[-4000:]}"
        )
    last = [l for l in out.stdout.splitlines() if l.startswith("PROBE_JSON:")][-1]
    return json.loads(last[len("PROBE_JSON:"):])


def load_done() -> dict[str, dict]:
    done: dict[str, dict] = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            for line in fh:
                if line.strip():
                    row = json.loads(line)
                    done[row["name"]] = row
    return done


def report() -> list[str]:
    done = load_done()
    rows = sorted(done.values(), key=lambda r: -r["hi"])
    print(f"{'query':40s} {'local[32]':>9s} {'local[4]':>9s} {'speedup':>8s}")
    flagged = []
    for r in rows:
        hi, lo = r["hi"], r["lo"]
        if hi < 0 or lo < 0:
            print(f"{r['name']:40s}   ERROR")
            flagged.append(r["name"])
            continue
        sp = lo / hi if hi else float("inf")
        mark = ""
        if hi >= 1.0 and sp < 1.6:
            mark = "  <-- serialization-bound?"
            flagged.append(r["name"])
        print(f"{r['name']:40s} {hi:9.2f} {lo:9.2f} {sp:8.1f}{mark}")
    print(f"FLAGGED={flagged}")
    return flagged


def main() -> None:
    if "--level" in sys.argv:
        i = sys.argv.index("--level")
        level_main(int(sys.argv[i + 1]), sys.argv[i + 2 :])
        return
    if "--report" in sys.argv:
        report()
        return

    sys.path.insert(0, REPO)
    from i3cols_spark.operators.registry import surface_order

    names = [n for n in surface_order() if n not in load_done()]
    print(f"probe_full: {len(names)} names to run (resumable at {OUT})")
    for start in range(0, len(names), CHUNK):
        chunk = names[start : start + CHUNK]
        t0 = time.time()
        hi = run_level(32, chunk)
        lo = run_level(4, chunk)
        with open(OUT, "a") as fh:
            for n in chunk:
                fh.write(json.dumps({"name": n, "hi": hi[n], "lo": lo[n]}) + "\n")
        print(
            f"chunk {start // CHUNK + 1}: {len(chunk)} names in "
            f"{time.time() - t0:.0f}s ({chunk[0]} .. {chunk[-1]})",
            flush=True,
        )
    report()


if __name__ == "__main__":
    main()
