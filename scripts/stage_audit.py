"""Stage-level audit for parallelism-probe suspects (round 11).

For each query: run once warm, then re-run with the Spark UI enabled
and pull per-stage task metrics from the REST API.  Reports, for every
stage that contributed meaningful time, (numTasks, executor-run
seconds) — a heavy stage with numTasks == 1 (or == a handful after an
AQE coalesce) is a genuine serialization bottleneck; many tiny stages
in sequence is driver-iteration latency (expected for the
iterative-loop operators at fixture scale, where each round is
milliseconds of compute behind a fixed scheduling cost).

Usage: python scripts/stage_audit.py q_name [q_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import SparkSession

    # session.get_spark disables the UI, so build an equivalent
    # session (same sizing/confs) with the UI on.
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("stage-audit")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/i3cols_spark_warehouse"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from i3cols_spark.operators import QUERIES

    # 4050 is only a request — Spark auto-increments on bind conflict,
    # so read the REAL bound address back from the context.
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise RuntimeError("Spark UI did not come up; cannot audit stages")
    api = f"{ui}/api/v1"
    app_id = spark.sparkContext.applicationId

    def stages_snapshot() -> dict[int, dict]:
        with urllib.request.urlopen(f"{api}/applications/{app_id}/stages") as r:
            data = json.load(r)
        return {s["stageId"]: s for s in data}

    for name in sys.argv[1:]:
        fn = QUERIES[name]
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()  # warm
        before = set(stages_snapshot())
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        time.sleep(1.0)
        after = stages_snapshot()
        new = [s for sid, s in after.items() if sid not in before]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        total_run = sum(s.get("executorRunTime") or 0 for s in new)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} stages, "
              f"executor-run total {total_run/1000.0:.2f}s")
        for s in new[:8]:
            run = (s.get("executorRunTime") or 0) / 1000.0
            if run < 0.05:
                continue
            n = s.get("numCompleteTasks") or s.get("numTasks")
            print(
                f"  stage {s['stageId']:>4} tasks={n:<4} run={run:7.2f}s "
                f"{(s.get('name') or '')[:70]}"
            )


if __name__ == "__main__":
    main()
