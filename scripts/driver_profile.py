"""Round-13 driver-bound profiler (VERDICT r12 item 6).

For each named query, split the wall cost the bench convention hides
into its driver-side phases:

  * construct  — the Python/py4j expression-building call
  * plan       — forcing ``queryExecution().executedPlan()`` (analysis
                 + optimization + physical planning, pre-AQE)
  * action     — the noop write (includes AQE re-planning + scheduling
                 + executor run)

plus the optimized-plan text size (proxy for Catalyst work) and the
number of jobs the action launched (scheduler round-trips).  Output:
one TSV row per query.

Usage: python scripts/driver_profile.py <query> [...]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    names = sys.argv[1:]
    passes = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import i3cols_spark

    print(f"# engine: {os.path.dirname(i3cols_spark.__file__)}", file=sys.stderr)
    from i3cols_spark.session import get_spark

    spark = get_spark("driver-profile")
    spark.sparkContext.setLogLevel("ERROR")
    from i3cols_spark.operators import QUERIES

    QUERIES["q_topk"](spark, sf_dir).collect()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    print("query\tconstruct_s\tplan_s\taction_s\twall_s\tplan_bytes\tnjobs")
    for name in names:
        best = None
        for _ in range(passes):
            w0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t_constr = time.perf_counter() - w0
            t0 = time.perf_counter()
            qe = df._jdf.queryExecution()
            qe.executedPlan()
            t_plan = time.perf_counter() - t0
            plan_bytes = len(
                df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
            )
            jobs_before = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile: {name}")
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t_action = time.perf_counter() - t1
            wall = time.perf_counter() - w0
            jobs_after = len(tracker.getJobIdsForGroup(None) or [])
            row = (
                round(t_constr, 3),
                round(t_plan, 3),
                round(t_action, 3),
                round(wall, 3),
                plan_bytes,
                jobs_after - jobs_before,
            )
            if best is None or row[3] < best[3]:
                best = row
        print(name + "\t" + "\t".join(str(x) for x in best))
        sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
