"""Render PARALLELISM_r12.md — the full-surface (324-name) parallelism
classification VERDICT r11 item 5 asked for.

Inputs: scripts/probe_full_r12.jsonl (coarse two-level wall sweep over
every registered name) and scripts/stage_audit_r12.jsonl (stage/task
concentration audit of everything the sweep flagged), plus the
hand-adjudication table below for the 17 stage-level DEFECT?
candidates (each checked against its implementation; two were real
and fixed this round).

Usage: python scripts/gen_parallelism_report.py  (writes PARALLELISM_r12.md)
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(REPO, "scripts", "probe_full_r12.jsonl")
AUDIT = os.path.join(REPO, "scripts", "stage_audit_r12.jsonl")
OUT = os.path.join(REPO, "PARALLELISM_r12.md")

# Hand adjudication of the stage-audit DEFECT? candidates (a heavy
# stage with one dominating task).  real-fixed = code changed this
# round; the rest are classified with the evidence that clears them.
ADJUDICATION = {
    "q_entity_resolution": (
        "real-fixed",
        "cross-job recompute: the levenshtein match join re-executed 3x "
        "(CC edge checkpoint + the 2 nodes-union branches); fixed with a "
        "lazy localCheckpoint of the match edges — executor-run 4.7 s -> "
        "2.1 s, hash-green at sf0.001/sf0.01/sf0.1",
    ),
    "q_join_fuzzy_names": (
        "real-fixed",
        "whole blocked-Levenshtein probe ran in the fixture's ONE input "
        "split; spread() the probe side (no-op at production file counts) "
        "— wall 2.3 s -> 0.4 s, same total executor work",
    ),
    "q_multimodal_scene_cuts": (
        "fixture-layout",
        "single-file blob fixture = one decode split; corpus-scale decode "
        "is file-count-parallel and shuffling blobs costs more than it "
        "buys (documented wontfix, BASELINE r11)",
    ),
    "q_multimodal_video_frames": (
        "fixture-layout",
        "same single-file blob argument as scene_cuts",
    ),
    "q_multimodal_gif_anim": (
        "fixture-layout",
        "same single-file blob argument as scene_cuts",
    ),
    "q_source_jsonl_gz_scan": (
        "format-inherent",
        "gzip is non-splittable by construction — one task per .gz file "
        "is the format's contract; the scale path is many files",
    ),
    "q_text_minhash_signature": (
        "fixture-layout",
        "per-row md5 signature work sits in the single fixture split; "
        "spread() tried and measured +7% WORSE (the 32-task shuffle "
        "overhead exceeds the ~1.8 s compute) — reverted, no-op at scale "
        "anyway since file count provides the parallelism",
    ),
    "q_similarity_maxsim": (
        "fixture-layout",
        "in-row HOF scoring in the single fixture split; spread() tried "
        "and measured +77% WORSE (1.0 -> 1.8 s) — reverted; at corpus "
        "scale the scan is file-count-parallel",
    ),
    "q_stats_ks_test": (
        "bounded-state-design",
        "the 1-task stage is the documented global ordered window over "
        "the DISTINCT-VALUE table (|support| rows, not |rows|) — the "
        "exact_percentiles trade, state bounded by the value support",
    ),
    "q_agg_sketch_histogram": (
        "bounded-state-design",
        "1-task stage is the quantile pick over the <=256-cell grid; "
        "sketch state is 2 KB/task at any SF (docstring scale shape)",
    ),
    "q_agg_approx_percentile": (
        "aqe-fixture-coalesce",
        "3-task reduce = AQE bytes-based coalesce of a tiny shuffle; "
        "linear map-side-combined compute, self-unwinding at real bytes",
    ),
    "q_profile_columns": (
        "aqe-fixture-coalesce",
        "same: all-column profile aggregate coalesced to 3 tasks at "
        "fixture bytes; map-side combined, linear",
    ),
    "q_join_interval_grid": (
        "bounded-state-design",
        "sweep-line over the day-value distribution — the heavy stage is "
        "day-granular (calendar-bounded) by design; AQE coalesces it at "
        "fixture bytes (VERDICT r09 rework, r11 hash-green)",
    ),
    "q_join_interval_overlap": (
        "aqe-fixture-coalesce",
        "broadcast BNL against a 24-row month dim + map-side agg; the "
        "3-task stage is the coalesced agg of a linear scan",
    ),
    "q_ts_mann_kendall": (
        "bounded-state-design",
        "the O(n^2) pair join runs on the per-(flag, month) AGGREGATE "
        "(calendar-bounded n); the flagged 3-task stage is the linear "
        "corpus aggregate under AQE fixture coalesce",
    ),
    "q_sql_lateral_topk": (
        "aqe-fixture-coalesce",
        "per-key top-k window coalesced to 3 tasks at fixture bytes; "
        "key-partitioned and linear at scale",
    ),
    "q_physics_pulse_summary": (
        "aqe-fixture-coalesce",
        "per-event array aggregation; 3-task stage is the coalesced "
        "reduce of a linear explode+agg",
    ),
}


def main() -> None:
    sweep = {r["name"]: r for r in map(json.loads, open(SWEEP))}
    audit = {r["name"]: r for r in map(json.loads, open(AUDIT))}
    import sys

    sys.path.insert(0, REPO)
    from scripts.stage_audit_sweep import classify

    rows = []
    for name, s in sorted(sweep.items()):
        hi, lo = s["hi"], s["lo"]
        sp = lo / hi if hi > 0 else float("nan")
        if not (hi >= 1.0 and sp < 1.6):
            cls, detail = "clear", f"wall speedup {sp:.1f}x" if hi >= 1.0 else "sub-1s wall"
        elif name in ADJUDICATION:
            cls, detail = ADJUDICATION[name]
        elif name in audit:
            acls, adetail = classify(audit[name])
            if acls == "DEFECT?":
                cls, detail = "UNADJUDICATED", adetail
            elif acls == "parallel-ok":
                cls, detail = "stage-parallel", (
                    "wall flat at fixture scale but executor work is "
                    "task-distributed: " + adetail
                )
            elif acls == "iterative-latency":
                cls, detail = "iterative-latency", adetail
            elif acls == "driver-bound":
                cls, detail = "driver-bound", adetail
            else:
                cls, detail = acls, adetail
        else:
            cls, detail = "flagged-unaudited", ""
        rows.append((name, hi, lo, sp, cls, detail))

    counts: dict[str, int] = {}
    for _, _, _, _, cls, _ in rows:
        counts[cls] = counts.get(cls, 0) + 1

    with open(OUT, "w") as fh:
        fh.write(
            "# Full-surface parallelism classification — round 12\n\n"
            "Two-level wall sweep (`scripts/probe_full_r12.jsonl`, "
            "local[32] vs local[4], identical 32-partition grid, sf0.1) "
            "over ALL 324 registered names, with everything the sweep "
            "flagged re-examined by the stage/task-concentration audit "
            "(`scripts/stage_audit_r12.jsonl`) — wall ratios at fixture "
            "scale turned out to be a weak classifier (80 of 112 flags "
            "were inversions that reproduce only in multi-query JVMs), "
            "so the binding evidence is per-stage task counts and "
            "max-task share, where a real serialization bug (the r11 "
            "interval-pairs shape) is directly visible.\n\n"
            f"Classes: {json.dumps(counts, indent=0)}\n\n"
            "- **clear** — wall speedup >= 1.6x across the 8x core "
            "ratio, or sub-1s wall (fixed overhead dominates; not "
            "judged).\n"
            "- **stage-parallel** — wall flat at fixture scale, but the "
            "stage audit shows the executor work spread across 16-64 "
            "task slots (the flat wall is per-stage scheduling latency "
            "on KB-sized partitions).\n"
            "- **iterative-latency** — driver-paced loop: many small "
            "stages, each parallel and |E|-sized at real scale.\n"
            "- **driver-bound** — executor-run < half the wall: "
            "planning/scheduling dominates at fixture scale.\n"
            "- **real-fixed / fixture-layout / format-inherent / "
            "bounded-state-design / aqe-fixture-coalesce** — the 17 "
            "stage-level DEFECT? candidates, each hand-adjudicated "
            "against its implementation (2 real, fixed this round; 15 "
            "cleared with the evidence in the table).\n\n"
            "| query | local[32] s | local[4] s | speedup | class | evidence |\n"
            "|---|---|---|---|---|---|\n"
        )
        for name, hi, lo, sp, cls, detail in rows:
            fh.write(
                f"| {name} | {hi:.2f} | {lo:.2f} | {sp:.1f} | {cls} | {detail} |\n"
            )
    print(f"wrote {OUT}: {len(rows)} rows, classes={counts}")


if __name__ == "__main__":
    main()
