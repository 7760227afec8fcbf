"""Round-12 evidence-rotation tripwire (VERDICT r11 item 1).

The driver consumes ``queries()`` in dict order under a 50-row budget.
Official coverage closed to 324/324 in round 11, so the r12 window is a
pure staleness refresh: the 28 remaining round-5 stamps first, then the
22 oldest round-6 stamps.  Everything here is recomputed from the
committed CORRECTNESS artifacts so a drifted rotation fails loudly.
"""

from __future__ import annotations

import json
import pathlib

from i3cols_spark.operators import CONTRACT_QUERIES, ORACLES, QUERIES


def _newest_rows(last_round: int) -> dict[str, int]:
    repo = pathlib.Path(__file__).resolve().parent.parent
    newest: dict[str, int] = {}
    for r in range(1, last_round + 1):
        art = repo / f"CORRECTNESS_r{r:02d}.json"
        if art.exists():
            for name in json.loads(art.read_text()):
                newest[name] = r
    return newest


def test_surface_order_round12_rotation():
    from i3cols_spark.operators.registry import (
        _R12_PRIORITY,
        _R12_STALE_QUEUE,
        _R12_STALE_R6,
        _R13_STALE_QUEUE,
    )

    assert len(CONTRACT_QUERIES) == 60
    assert len(_R12_PRIORITY) == 50
    assert len(set(_R12_PRIORITY)) == 50
    # Since round 13 the live window is _R13_PRIORITY (see
    # test_rotation_r13.py); the r12 tuples stay pinned as history.

    newest = _newest_rows(11)

    window = list(_R12_PRIORITY)
    assert tuple(window[:28]) == _R12_STALE_QUEUE
    assert tuple(window[28:]) == _R12_STALE_R6

    # Coverage is closed: every registered name has an official row,
    # so every window slot is a re-witness of an existing stamp.
    never_checked = [n for n in QUERIES if n not in newest]
    assert never_checked == [], never_checked

    # Slots 1-28 are exactly the LAST round-5 stamps in the repo...
    r5 = {n for n, r in newest.items() if r == 5 and n in QUERIES}
    assert set(_R12_STALE_QUEUE) == r5
    # ...and slots 29-50 plus the declared round-13 queue cover the
    # round-6-stamped set exactly, with no double-booking.
    r6 = {n for n, r in newest.items() if r == 6 and n in QUERIES}
    assert set(_R12_STALE_R6) | set(_R13_STALE_QUEUE) == r6
    assert not set(_R12_STALE_R6) & set(_R13_STALE_QUEUE)
    assert len(_R12_STALE_R6) == 22
    assert len(_R13_STALE_QUEUE) == 28

    # Every window slot must produce a hash row, never a no_oracle
    # record — the registry is fully oracle-backed since round 10.
    no_oracle_in_window = [n for n in window if n not in ORACLES]
    assert not no_oracle_in_window, no_oracle_in_window
    rows_only_left = [n for n in QUERIES if n not in ORACLES]
    assert rows_only_left == [], rows_only_left

    # Every contract query has an oracle entry.
    missing = [n for n in CONTRACT_QUERIES if n not in ORACLES]
    assert not missing, f"contract queries without oracle: {missing}"


def test_round12_window_landed_green():
    """CORRECTNESS_r12.json must contain exactly the 50 names the r12
    rotation promised, all fully green (rows+schema+hash) — the same
    history guard test_round11_window_landed_green provides for r11."""
    from i3cols_spark.operators.registry import _R12_PRIORITY

    repo = pathlib.Path(__file__).resolve().parent.parent
    art = json.loads((repo / "CORRECTNESS_r12.json").read_text())
    assert sorted(art) == sorted(_R12_PRIORITY)
    bad = {
        n: row
        for n, row in art.items()
        if not (row["rows_match"] and row["schema_match"] and row["hash_match"])
        or row["err"] is not None
        or row["spark_rows"] == 0
    }
    assert not bad, bad


def test_round11_window_landed_green():
    """The r11 artifact must contain exactly the 50 names the r11
    rotation promised, all fully green — guards against silently
    re-ordering history when the rotation tuples are edited."""
    from i3cols_spark.operators.registry import _R11_PRIORITY

    repo = pathlib.Path(__file__).resolve().parent.parent
    art = json.loads((repo / "CORRECTNESS_r11.json").read_text())
    assert sorted(art) == sorted(_R11_PRIORITY)
    bad = {
        n: row
        for n, row in art.items()
        if not (row["rows_match"] and row["schema_match"] and row["hash_match"])
        or row["err"] is not None
        or row["spark_rows"] == 0
    }
    assert not bad, bad
