"""CLI regression checks that don't need a SparkSession (the Spark
subcommands are driven end-to-end by the verify workflow — an
in-process test would stop the shared test session)."""

from __future__ import annotations

import subprocess
import sys


def test_cli_list_names_every_registered_query():
    out = subprocess.run(
        [sys.executable, "-m", "i3cols_spark.cli", "list"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
        check=True,
    ).stdout
    listed = {line.split("\t")[0] for line in out.strip().splitlines()}
    from i3cols_spark.operators import ORACLES, QUERIES

    assert listed == set(QUERIES)
    # oracle/rows-only tags faithful to the registry
    for line in out.strip().splitlines():
        name, kind = line.split("\t")
        assert kind == ("oracle" if name in ORACLES else "rows-only")


def test_cli_unknown_subcommand_exits_nonzero():
    proc = subprocess.run(
        [sys.executable, "-m", "i3cols_spark.cli", "frobnicate"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=60,
    )
    assert proc.returncode != 0
    assert "invalid choice" in proc.stderr
