"""Stage-concentration sweep over parallelism-probe suspects (round 12).

The two-level wall-clock probe (local[32] vs local[4]) turned out to be
an unreliable classifier at fixture scale: 80 of its 112 flags were
*inversions* (slower at 32 cores), which reproduce only inside
multi-query JVMs and vanish on a fresh single-query session — i.e.
accumulated-state measurement noise plus per-task fixed overhead on
KB-sized partitions, not plan defects.  (Verified directly: a fresh
JVM pair runs q_ts_holt_winters at 1.26 s / 1.17 s — no inversion.)

What a REAL serialization bug looks like (the r11 q_join_interval_pairs
find) is a *heavy stage whose work sits in one task* — either AQE
coalesced the grid to 1 partition ahead of an explosive operation, or
one key soaks up the stage (skew).  That is directly observable from
stage/task metrics, robustly to wall-clock noise.  This sweep runs
every suspect once (warm + measured) at local[32] with the UI on and
records, per new stage: task count, executor-run time, and the MAX
single-task run time (via the taskSummary quantile endpoint).

A query is a defect candidate iff some stage has
    run >= max(0.5 s, 25% of the query's total executor-run)  AND
    max_task_run / stage_run >= 0.7
(one task dominates a heavy stage).  Everything else flagged by the
wall probe is classified fixture-overhead / iterative-loop latency.

Usage:
    python scripts/stage_audit_sweep.py [names...]   # default: probe flags
    python scripts/stage_audit_sweep.py --report
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(REPO, "scripts", "probe_full_r12.jsonl")
OUT = os.path.join(REPO, "scripts", "stage_audit_r12.jsonl")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CHUNK = 12


def sweep_flagged() -> list[str]:
    rows = [json.loads(l) for l in open(SWEEP) if l.strip()]
    return [
        r["name"]
        for r in sorted(rows, key=lambda r: -r["hi"])
        if r["hi"] >= 1.0 and (r["hi"] <= 0 or r["lo"] / r["hi"] < 1.6)
    ]


def load_done() -> dict[str, dict]:
    done: dict[str, dict] = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            for line in fh:
                if line.strip():
                    row = json.loads(line)
                    done[row["name"]] = row
    return done


def level_main(names: list[str]) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("stage-audit-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4052")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/i3cols_spark_warehouse"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from i3cols_spark.operators import QUERIES

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    api = f"{ui}/api/v1/applications/{app_id}"

    def stages_snapshot() -> dict[tuple[int, int], dict]:
        with urllib.request.urlopen(f"{api}/stages") as r:
            data = json.load(r)
        return {(s["stageId"], s["attemptId"]): s for s in data}

    def max_task_ms(stage_id: int, attempt: int) -> float:
        url = (
            f"{api}/stages/{stage_id}/{attempt}/taskSummary"
            "?quantiles=1.0"
        )
        try:
            with urllib.request.urlopen(url) as r:
                d = json.load(r)
            return float(d["executorRunTime"][0])
        except Exception:
            return -1.0

    for name in names:
        fn = QUERIES[name]
        try:
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()  # warm
            before = set(stages_snapshot())
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            time.sleep(0.8)
            after = stages_snapshot()
        except Exception as exc:
            print("ROW:" + json.dumps({"name": name, "err": repr(exc)}), flush=True)
            continue
        new = [s for key, s in after.items() if key not in before]
        total_run = sum(s.get("executorRunTime") or 0 for s in new)
        stages = []
        for s in sorted(new, key=lambda s: -(s.get("executorRunTime") or 0)):
            run = s.get("executorRunTime") or 0
            if run < 200 and len(stages) >= 4:
                continue
            mt = max_task_ms(s["stageId"], s["attemptId"])
            stages.append(
                {
                    "id": s["stageId"],
                    "tasks": s.get("numCompleteTasks") or s.get("numTasks"),
                    "run_ms": run,
                    "max_task_ms": mt,
                    "name": (s.get("name") or "")[:60],
                }
            )
            if len(stages) >= 8:
                break
        print(
            "ROW:"
            + json.dumps(
                {
                    "name": name,
                    "wall": wall,
                    "total_run_ms": total_run,
                    "n_stages": len(new),
                    "stages": stages,
                }
            ),
            flush=True,
        )


def classify(row: dict) -> tuple[str, str]:
    """Return (class, detail) for an audited row."""
    if "err" in row:
        return "error", row["err"]
    total = row["total_run_ms"] or 1
    for s in row["stages"]:
        run = s["run_ms"]
        if run >= max(500, 0.25 * total) and s["max_task_ms"] > 0:
            conc = s["max_task_ms"] / run
            if conc >= 0.7 and run >= 500:
                return (
                    "DEFECT?",
                    f"stage {s['id']} tasks={s['tasks']} run={run/1000:.2f}s "
                    f"max_task={s['max_task_ms']/1000:.2f}s conc={conc:.2f}",
                )
    if total < 500 * row["wall"]:  # executor work < half the wall
        return "driver-bound", (
            f"executor run {total/1000:.2f}s vs wall {row['wall']:.2f}s "
            f"(planning/scheduling dominates at fixture scale)"
        )
    if row["n_stages"] >= 12 and total / 1000.0 < 2.0 * row["wall"]:
        return "iterative-latency", f"{row['n_stages']} stages, run {total/1000:.1f}s"
    return "parallel-ok", (
        f"eff_par={total/1000/max(row['wall'],1e-9):.1f} over {row['n_stages']} stages"
    )


def report() -> None:
    done = load_done()
    rows = sorted(done.values(), key=lambda r: -(r.get("wall") or 0))
    counts: dict[str, int] = {}
    for r in rows:
        cls, detail = classify(r)
        counts[cls] = counts.get(cls, 0) + 1
        wall = r.get("wall")
        print(f"{r['name']:42s} {wall if wall is None else f'{wall:6.2f}'} {cls:18s} {detail}")
    print(f"SUMMARY={counts}")


def main() -> None:
    if "--level" in sys.argv:
        i = sys.argv.index("--level")
        level_main(sys.argv[i + 1 :])
        return
    if "--report" in sys.argv:
        report()
        return
    names = sys.argv[1:] or sweep_flagged()
    names = [n for n in names if n not in load_done()]
    print(f"stage sweep: {len(names)} names (resumable at {OUT})")
    for start in range(0, len(names), CHUNK):
        chunk = names[start : start + CHUNK]
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--level", *chunk],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=5400,
        )
        rows = [
            json.loads(l[len("ROW:"):])
            for l in out.stdout.splitlines()
            if l.startswith("ROW:")
        ]
        with open(OUT, "a") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        status = f"{len(rows)}/{len(chunk)}"
        if out.returncode != 0:
            status += f" rc={out.returncode}"
        print(
            f"chunk {start // CHUNK + 1}: {status} in {time.time() - t0:.0f}s",
            flush=True,
        )
    report()


if __name__ == "__main__":
    main()
