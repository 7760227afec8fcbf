#!/usr/bin/env bash
# Round-close checklist (VERDICT r09 item 3): the per-round driver
# artifacts (BENCH_r*.json, CORRECTNESS_r*.json, VERDICT.md, ADVICE.md)
# sat untracked at judge time four rounds in a row.  Run this before
# ending a round: it fails loudly if any round artifact or source file
# is untracked/dirty, so "git status clean" is part of the recipe.
set -euo pipefail
cd "$(dirname "$0")/.."

bad=$(git status --porcelain)
if [ -n "$bad" ]; then
    echo "ROUND CLOSE FAILED — uncommitted paths:" >&2
    echo "$bad" >&2
    exit 1
fi
echo "round close: git status clean, all artifacts tracked"
