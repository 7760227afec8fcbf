"""Precise re-probe of full-sweep flagged names (round 12).

The full-surface sweep (parallelism_probe_full.py, 24 names/JVM,
warm+1 run) flagged 112 names — but cross-checking against
BENCH_r11's per-query walls showed the sweep's local[32] numbers were
inflated 1.5-6x by accumulated per-JVM state (80 of the flags were
*inversions*, slower at 32 cores than 4, which no real plan defect
produces on an idle box).  Per the probe's own docstring, a coarse
flag is only a re-check trigger: this script re-runs every flagged
name through the PRECISE methodology (parallelism_probe.py: fresh JVM
pair per small chunk, warm + min-of-2) and appends rows to OUT.

Usage:
    python scripts/probe_recheck.py               # re-probe all flagged
    python scripts/probe_recheck.py --report      # classify OUT
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(REPO, "scripts", "probe_full_r12.jsonl")
OUT = os.path.join(REPO, "scripts", "probe_recheck_r12.jsonl")
PROBE = os.path.join(REPO, "scripts", "parallelism_probe.py")
CHUNK = 6  # small: keeps per-JVM accumulated state out of the numbers


def sweep_flagged() -> list[str]:
    rows = [json.loads(l) for l in open(SWEEP) if l.strip()]
    out = []
    for r in sorted(rows, key=lambda r: -r["hi"]):
        if r["hi"] >= 1.0 and (r["hi"] <= 0 or r["lo"] / r["hi"] < 1.6):
            out.append(r["name"])
    return out


def load_done() -> dict[str, dict]:
    done: dict[str, dict] = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            for line in fh:
                if line.strip():
                    row = json.loads(line)
                    done[row["name"]] = row
    return done


def report() -> None:
    done = load_done()
    rows = sorted(done.values(), key=lambda r: -r["hi"])
    print(f"{'query':42s} {'local[32]':>9s} {'local[4]':>9s} {'speedup':>8s}")
    still = []
    for r in rows:
        sp = r["lo"] / r["hi"] if r["hi"] else float("inf")
        mark = ""
        if r["hi"] >= 1.0 and sp < 1.6:
            mark = "  <-- still flat"
            still.append(r["name"])
        print(f"{r['name']:42s} {r['hi']:9.2f} {r['lo']:9.2f} {sp:8.1f}{mark}")
    print(f"STILL_FLAGGED({len(still)})={still}")


def main() -> None:
    if "--report" in sys.argv:
        report()
        return
    names = [n for n in sweep_flagged() if n not in load_done()]
    print(f"recheck: {len(names)} names (resumable at {OUT})")
    for start in range(0, len(names), CHUNK):
        chunk = names[start : start + CHUNK]
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, PROBE, *chunk],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=5400,
        )
        if out.returncode != 0:
            print(f"chunk FAILED ({chunk}):\n{out.stderr[-2000:]}", flush=True)
            continue
        # parse the probe's ratio table back into rows
        parsed: dict[str, tuple[float, float]] = {}
        for line in out.stdout.splitlines():
            parts = line.split()
            if len(parts) >= 4 and parts[0] in chunk:
                try:
                    parsed[parts[0]] = (float(parts[1]), float(parts[2]))
                except ValueError:
                    pass
        with open(OUT, "a") as fh:
            for n in chunk:
                if n in parsed:
                    hi, lo = parsed[n]
                    fh.write(json.dumps({"name": n, "hi": hi, "lo": lo}) + "\n")
        print(
            f"chunk {start // CHUNK + 1}: {len(parsed)}/{len(chunk)} in "
            f"{time.time() - t0:.0f}s ({chunk[0]} .. {chunk[-1]})",
            flush=True,
        )
    report()


if __name__ == "__main__":
    main()
