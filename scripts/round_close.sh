#!/usr/bin/env bash
# Round-close checklist (VERDICT r09 item 3): the per-round driver
# artifacts (BENCH_r*.json, CORRECTNESS_r*.json, VERDICT.md, ADVICE.md)
# sat untracked at judge time four rounds in a row.  Run this before
# ending a round: it fails loudly if any round artifact or source file
# is untracked/dirty, so "git status clean" is part of the recipe.
set -euo pipefail
cd "$(dirname "$0")/.."

# VERDICT r11 blocking nit: a post-battery source commit stranded a
# stale CATALOG.md (line numbers drifted, test_catalog_current red at
# the closing tree).  Regenerate + diff-check here so the catalog can
# never be stale at close: if the regen changes the file, the close
# fails and the refreshed catalog is left in the tree to commit.
python scripts/gen_catalog.py >/dev/null
if ! git diff --quiet -- CATALOG.md; then
    echo "ROUND CLOSE FAILED — CATALOG.md was stale; regenerated copy" >&2
    echo "left in the working tree: commit it and re-run." >&2
    exit 1
fi

bad=$(git status --porcelain)
if [ -n "$bad" ]; then
    echo "ROUND CLOSE FAILED — uncommitted paths:" >&2
    echo "$bad" >&2
    exit 1
fi
echo "round close: git status clean, all artifacts tracked"
